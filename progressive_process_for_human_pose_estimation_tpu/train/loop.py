"""The single train/eval step, jit-compiled and mesh-sharded.

Replaces the reference's per-script training loops (canonical:
/root/reference/train.py:874-987). One functional step: forward (bf16),
loss, grad, Adam update, BatchNorm running-stat update — all inside one XLA
program; the batch is sharded over the mesh's ``data`` axis and XLA inserts
the gradient all-reduce over ICI. Loss NaN-guarding (the reference's manual
``math.isnan`` print, /root/reference/try_skeleton_and_keypoints.py:436-437)
is an optional ``jnp.isfinite`` check returned in metrics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..parallel import shard_batch
from .state import TrainState


def donation_supported() -> bool:
    """Whether buffer donation is safe on this backend.

    Donating the TrainState into the jitted step saves a full state copy
    per step on real hardware, but on the axon remote-TPU tunnel a donated
    step never completes (measured: the result readback hangs indefinitely
    while donate=False runs in seconds). Detect the tunnel via the PJRT
    platform_version string and fall back to copying there.
    """
    try:
        ver = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in ver


def make_train_step(
    model,
    objective: Callable,
    donate: bool = True,
    check_finite: bool = True,
    skip_nonfinite: bool = False,
):
    """Build the jit-compiled train step.

    Args:
      model: a flax module whose __call__ returns a list of NHWC logits (or
        a single array for MaskNet-style models).
      objective: (outputs, batch, epoch) -> (loss, metrics dict).
      skip_nonfinite: when True, a step whose loss is NaN/Inf leaves params,
        optimizer state, and BN statistics untouched (the step counter still
        advances) — a production upgrade over the reference's NaN print
        (/root/reference/try_skeleton_and_keypoints.py:436-437).
    Returns:
      step(state, batch) -> (state, metrics). `batch` is a dict with key
      'image' plus whatever targets the objective reads.
    """

    def loss_fn(params, batch_stats, batch, epoch):
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"],
            mutable=["batch_stats"],
        )
        if not isinstance(outputs, (list, tuple)):
            outputs = [outputs]
        outputs = [o.astype(jnp.float32) for o in outputs]
        loss, metrics = objective(outputs, batch, epoch)
        return loss, (metrics, updates["batch_stats"])

    def step(state: TrainState, batch):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, state.epoch)
        ok = jnp.isfinite(loss)
        if check_finite:
            metrics["finite"] = ok
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        if skip_nonfinite:
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )
            new_state = new_state.replace(
                params=keep(new_state.params, state.params),
                opt_state=keep(new_state.opt_state, state.opt_state),
                batch_stats=keep(new_state.batch_stats, state.batch_stats),
            )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_apply(eval_model, batch_stats: bool = False):
    """Unjitted eval forward honoring the test-time BatchNorm mode.

    ``batch_stats=False`` — running averages, the reference's ``.eval()``
    mode (train.py:991, hourglass_compare.py:1044, performance_compare.py:619;
    ``eval_model`` must be built with ``use_running_average=True``).
    ``batch_stats=True`` — current-batch statistics, the try_* scripts' test
    behavior (they never call ``.eval()``; ``use_running_average=False``):
    flax requires ``mutable=['batch_stats']``, and the EMA updates are
    computed and DISCARDED (torch train-mode inference also updates its EMAs,
    they just never get read back).

    Returns ``apply(variables, images) -> list-of-stage-outputs`` suitable
    for embedding in a caller's jitted eval function.
    """

    def apply(variables, images):
        if batch_stats:
            outs, _ = eval_model.apply(
                variables, images, mutable=["batch_stats"]
            )
        else:
            outs = eval_model.apply(variables, images)
        return outs if isinstance(outs, (list, tuple)) else [outs]

    return apply


def make_eval_step(eval_model, batch_stats: bool = False):
    """Jitted forward-only step: ``step(params, batch_stats, images) ->
    [fp32 stage outputs]``. See :func:`make_eval_apply` for the BN-mode
    semantics (running averages = the reference's ``.eval()`` path; batch
    statistics = the try_* scripts' test behavior)."""
    apply = make_eval_apply(eval_model, batch_stats)

    def step(params, batch_stats_vars, images):
        outputs = apply(
            {"params": params, "batch_stats": batch_stats_vars}, images
        )
        return [o.astype(jnp.float32) for o in outputs]

    return jax.jit(step)


def fit_epoch(
    train_step,
    state: TrainState,
    batches,
    mesh=None,
    log_every: int = 50,
    log_fn: Optional[Callable] = None,
    render_fn: Optional[Callable] = None,
    key=None,
    image_every: int = 0,
    image_fn: Optional[Callable] = None,
    step_offset: int = 0,
    trace_fn: Optional[Callable] = None,
):
    """Run one epoch over an iterable of host batches — THE train loop
    (cli.train consumes this; there is no second copy).

    Mirrors the reference loop cadence (/root/reference/train.py:874-956):
    metrics every ``log_every`` steps; rendered prediction grids every
    ``image_every`` steps via ``image_fn(i, state, batch)``.

    ``step_offset`` is the global step count before this epoch; the log/image
    cadence is measured on the GLOBAL step, not the within-epoch index. (At
    the reference's thousands of steps per epoch the two are indistinguishable;
    at demo scale — 2 steps/epoch — the within-epoch rule fired at i=0 every
    epoch, and the blocking ``device_get`` readback per epoch serialized the
    remote-TPU tunnel: every epoch paid a full RTT with the chip idle.)

    ``render_fn(key, host_batch) -> device batch`` moves target rendering
    (Gaussians/class maps/augmentation) on device per batch; ``key`` is the
    PRNG key threaded through it (required when render_fn is given).
    """
    metrics = None
    for i, batch in enumerate(batches):
        if render_fn is not None:
            key, sub = jax.random.split(key)
            batch = dict(render_fn(sub, batch))
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = train_step(state, batch)
        if trace_fn is not None:
            # Called EVERY step with device values — implementations must
            # not read back (see utils.metrics.DeviceLossTrace).
            trace_fn(step_offset + i, metrics)
        if log_fn is not None and (step_offset + i) % log_every == 0:
            log_fn(i, jax.device_get(metrics))
        if image_fn is not None and image_every > 0 \
                and (step_offset + i) % image_every == 0:
            image_fn(i, state, batch)
    state = state.replace(epoch=state.epoch + 1)
    return state, metrics, key
