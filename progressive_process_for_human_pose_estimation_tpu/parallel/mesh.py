"""Device mesh + sharding helpers (SPMD data parallelism over ICI).

The reference is strictly single-GPU (no torch.distributed/NCCL anywhere —
SURVEY.md §2.4); its only parallelism is DataLoader worker processes. The
TPU-native equivalent is SPMD over a ``jax.sharding.Mesh``:

- a 1-D ``data`` axis spanning all chips of the ICI-connected slice;
- batches sharded on ``data``; parameters/optimizer state replicated;
- gradients reduced by XLA-inserted all-reduces over ICI (no explicit
  collectives needed at this model scale — jit + shardings suffice);
- optional cross-replica BatchNorm via ``bn_axis_name`` (lax.pmean inside
  flax BatchNorm) — off by default to preserve the reference's per-device
  batch statistics (SURVEY.md §7 parity note).

A ``model`` axis placeholder is kept in the mesh so tensor-parallel layouts
can be added without re-plumbing call sites (SURVEY.md §2.4: "keep
mesh-general layout so TP axis can be added").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    With the default model=1 this is pure data parallelism; the batch axis
    shards over all chips, riding ICI within a slice.
    """
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC batches: leading (batch) axis split on ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch axis sharded on ``data``.

    Single-process: a direct ``device_put``. Multi-process: each host passes
    its *local* shard and the result is the assembled global batch
    (``jax.make_array_from_process_local_data``) — so train loops written
    against this helper scale to multi-host unchanged.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
