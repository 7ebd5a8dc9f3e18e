"""Multi-host (multi-process) SPMD support.

The reference is single-process/single-GPU (SURVEY.md §2.4: no
torch.distributed/NCCL/MPI anywhere), so this subsystem has no reference
counterpart to mirror — it is the TPU-native scaling path stated in
SURVEY.md §5 "Distributed communication backend": ``jax.distributed
.initialize()`` + a data mesh over all chips of the slice, with **per-host
sharded file lists** feeding per-host device batches, and XLA collectives
riding ICI (single slice) / DCN (multi-slice).

Single-process runs (the common case in this repo: one chip, or the
8-virtual-device CPU test mesh) pass through unchanged: ``initialize()`` is
a no-op when no coordinator is configured, ``host_shard`` returns the whole
manifest, and ``host_batches_to_global`` is the identity placement.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np



def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime when running multi-process.

    Arguments default from the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``);
    on TPU pods launched through the platform launcher all three are
    auto-detected and ``jax.distributed.initialize()`` needs no arguments.
    A plain single-process run (nothing configured) is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    # Idempotent: a driver that runs several train/eval mains in one
    # process (e.g. train -> resume) must not re-initialize the runtime.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(
    n_samples: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    seed: Optional[int] = None,
) -> np.ndarray:
    """Per-host sample indices: contiguous round-robin split of a manifest.

    Every host must see a *disjoint* slice of the dataset so the global
    batch (assembled across hosts by ``host_batches_to_global``) covers it
    exactly once per epoch. With ``seed`` the indices are first permuted
    identically on every host (same seed → same permutation), which is the
    multi-host analogue of the reference DataLoader's ``shuffle=True``
    (/root/reference/train.py:821-823).
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    idx = np.arange(n_samples)
    if seed is not None:
        idx = np.random.default_rng(seed).permutation(idx)
    # Drop the ragged tail so every host contributes the same count per
    # epoch: multi-process steps are collective programs, so every host must
    # run the SAME number of batches (a host with one extra batch deadlocks
    # the others). Equal shards are required for correctness, not just
    # static shapes — but the drop must never be silent, because for
    # evaluation it means up to process_count-1 samples are not scored.
    per_host = n_samples // process_count
    dropped = n_samples - per_host * process_count
    if dropped and process_index == 0:
        import warnings

        warnings.warn(
            f"host_shard: dropping {dropped} of {n_samples} samples so all "
            f"{process_count} hosts run equal collective step counts; for "
            "exact multi-host evaluation pad the manifest to a multiple of "
            "the process count",
            stacklevel=2,
        )
    return idx[process_index * per_host : (process_index + 1) * per_host]


def host_batches_to_global(batch, mesh):
    """Assemble per-host batch shards into one globally-sharded batch.

    Each process passes its *local* batch (``global_batch / process_count``
    samples); the result is a pytree of ``jax.Array``s whose leading axis is
    the global batch, sharded over the mesh's ``data`` axis. This is exactly
    ``shard_batch`` (whose multi-process branch does the same global
    assembly); kept as a named alias for the multi-host API surface.
    """
    from .mesh import shard_batch

    return shard_batch(batch, mesh)
