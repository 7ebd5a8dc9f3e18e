"""Checkpointing with shape-filtered fine-tune restore.

Reference semantics (SURVEY.md §5): per-epoch ``torch.save({'epoch',
'state_dict', 'optimizer'})`` to an experiment-named file
(/root/reference/train.py:982-987); resume restores optimizer + epoch
(train.py:868-872); ``retrain`` forces a fresh start (train.py:853);
**fine-tune** copies only the donor tensors whose shapes match the target
model (train.py:856-867) — how the MPII model was warm-started from COCO.

TPU-native equivalents here via orbax: async-capable save of the TrainState
pytree, plus :func:`shape_filtered_restore` for the fine-tune workflow.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def save_checkpoint(
    path: str, state: TrainState, loss_history=None, async_save: bool = False
) -> None:
    """Save {epoch, step, params, batch_stats, opt_state} (train.py:982-987).

    ``loss_history`` (dict name → list/array of per-step values) gives the
    reference's ``'loss'`` checkpoint-key parity — every script saves its
    loss arrays alongside the weights (/root/reference/train.py:982-987,
    try_with_aspp.py:402-406). Stored as ``loss_history.npz`` next to the
    weights so the orbax tree keeps a fixed template.

    ``async_save=True`` (SURVEY.md §5: orbax async save) returns as soon as
    the state is snapshotted; the HBM→disk write overlaps the next epoch.
    At most one save is in flight — a new one first drains the previous.
    Call :func:`wait_for_checkpoints` before exiting."""
    path = os.path.abspath(path)
    tree = {
        "epoch": state.epoch,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if async_save:
        global _ASYNC_CKPTR
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        _ASYNC_CKPTR.wait_until_finished()
        _ASYNC_CKPTR.save(path, args=ocp.args.StandardSave(tree), force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, tree, force=True)
    if loss_history is not None and jax.process_index() == 0:
        # Written NEXT to the orbax dir (not inside): an async save finalizes
        # the directory after this function returns. Process 0 only — the
        # orbax save above is a collective every process must enter, but
        # this sidecar is a plain file write that would race across hosts.
        np.savez(
            path + ".loss_history.npz",
            **{k: np.asarray(v, np.float64) for k, v in loss_history.items()},
        )


def wait_for_checkpoints() -> None:
    """Drain any in-flight async checkpoint write (no-op otherwise)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_loss_history(path: str):
    """Restore the loss-history arrays saved with a checkpoint, or {} when
    absent (the reference resumes ``loss_array = state['loss']``,
    /root/reference/try_different_stack_without_skeleton.py:383)."""
    path = os.path.abspath(path)
    f = path + ".loss_history.npz"
    if not os.path.exists(f):  # pre-round-2 layout: inside the ckpt dir
        f = os.path.join(path, "loss_history.npz")
    if not os.path.exists(f):
        return {}
    with np.load(f) as z:
        return {k: list(z[k]) for k in z.files}


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Full resume: params + optimizer + epoch counter (train.py:868-872).

    The ``epoch``/``step`` bookkeeping scalars are restored as HOST (numpy)
    arrays — numpy template leaves make orbax skip device placement for
    them — so the resume arithmetic (``int(state.epoch)`` in cli.train)
    never needs a device readback before the first step. On the remote-TPU
    tunnel a D2H readback of a freshly H2D-committed restore can block
    behind transfer-path stalls (same class as the donation hang,
    ROUND3_NOTES); on any backend it is a pointless sync. The scalars
    rejoin the device state at the first jitted step dispatch.
    """
    path = os.path.abspath(path)
    template = {
        "epoch": np.zeros(state.epoch.shape, state.epoch.dtype),
        "step": np.zeros(state.step.shape, state.step.dtype),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return state.replace(
        epoch=restored["epoch"],
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def load_checkpoint_raw(path: str) -> Any:
    """Load a checkpoint as plain arrays without a shape template — needed
    for fine-tune restores where the donor's head shapes differ from the
    target model's (train.py:856-867)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def shape_filtered_restore(donor: Any, target: Any) -> Any:
    """Copy donor leaves into target wherever path AND shape match
    (/root/reference/train.py:856-867). Leaves missing from the donor or
    with mismatched shapes keep the target's (fresh) values — this is the
    reference's fine-tune warm start across head-size changes."""
    donor_flat = dict(jax.tree_util.tree_flatten_with_path(donor)[0])
    target_flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    out = []
    for path, leaf in target_flat:
        d = donor_flat.get(path)
        if d is not None and np.shape(d) == np.shape(leaf):
            out.append(d)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def maybe_resume(
    path: str, state: TrainState, retrain: bool = False, fine_tune: bool = False
) -> TrainState:
    """The reference's resume decision tree (train.py:853-872):
    retrain/missing file -> fresh; fine_tune -> shape-filtered params only,
    epoch 0; else full restore."""
    if retrain or not os.path.exists(path):
        return state
    if fine_tune:
        raw = load_checkpoint_raw(path)
        return state.replace(
            params=shape_filtered_restore(raw["params"], state.params),
            batch_stats=shape_filtered_restore(raw["batch_stats"], state.batch_stats),
        )
    return restore_checkpoint(path, state)
