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


def mesh_rule(local_batch: int, n_devices: int, n_processes: int) -> bool:
    """Pure gating rule for building a data-parallel training mesh.

    The sharded batch axis carries the GLOBAL batch (local_batch per host x
    n_processes hosts) over the GLOBAL device count, so divisibility is
    checked there. (Round 2 compared the per-host batch against the global
    device count, which silently disabled the mesh on any real multi-host
    pod.)

    Returns True to build a mesh, False for the single-device path.
    Multi-process runs REQUIRE a mesh — every host feeds its local shard
    into a global array via ``shard_batch`` — so an indivisible batch is a
    loud error, never a silent fallback to per-host unsynced training.
    """
    global_batch = local_batch * n_processes
    if n_processes > 1:
        if global_batch % n_devices != 0:
            raise ValueError(
                f"multi-process run: global batch {global_batch} "
                f"({local_batch}/host x {n_processes} hosts) does not divide "
                f"over {n_devices} devices; adjust --batch-size"
            )
        return True
    return n_devices > 1 and local_batch % n_devices == 0


def mesh_for_batch(local_batch: int) -> Optional[Mesh]:
    """Build the data-parallel mesh for a run with this per-host batch size,
    or None when the single-device path applies (see :func:`mesh_rule`)."""
    if mesh_rule(local_batch, len(jax.devices()), jax.process_count()):
        return make_mesh()
    return None


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


def replicate_to_mesh(tree, mesh: Mesh):
    """Commit a pytree (train state) to the mesh fully replicated.

    Multi-process: every host holds the full value (identical init or an
    identical checkpoint restore), so the global replicated array is
    assembled with ``make_array_from_process_local_data`` — a plain
    ``device_put`` to a multi-host sharding would demand a cross-host
    device transfer, which CPU/Gloo (and plain ICI-only slices) don't
    support. Single-process: an ordinary replicated device_put.
    """
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.device_put(tree, sh)
