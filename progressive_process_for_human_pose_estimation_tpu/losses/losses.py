"""The reference's full loss family, as pure jit-compatible functions.

All functions take NHWC logits/predictions (the reference is NCHW; channel
position is the only difference) and integer class maps / float heatmaps, and
return a scalar (fp32). Covered, with reference citations:

- :func:`ce_loss` — ``nn.CrossEntropyLoss`` over spatial class maps
  (/root/reference/try_skeleton.py:407-411, train.py:801-805).
- :func:`ohem_ce_loss` — bootstrapped/OHEM top-k CE: per-pixel NLL, keep the
  top ``k = int(H*W*fraction)`` losses per sample, mean over the kept set;
  ``fraction`` is clamped below at ``floor`` (0.1 in train.py:343-362, 0.25 in
  try_remove_background_and_costomer_loss.py:156-170 and
  try_costomer_loss.py:156-169 where it is a fixed 0.25). The training loop
  anneals ``fraction = (100 - epoch)/100`` (train.py:887-888).
- :func:`combined_ohem_ce_loss` — OHEM CE + plain CE, the final model's
  per-stage objective (train.py:887-888).
- :func:`masked_ce_loss` / :func:`masked_mse_loss` — losses weighted by the
  *predicted* stage-1 foreground mask (train.py:365-391, wiring
  try_remove_background_and_costomer_loss.py:419-421).
- :func:`mse_loss` / :func:`ohem_mse_loss` — per-stack Gaussian-heatmap MSE
  (try_with_torch.py:333-341) and its OHEM variant (train.py:394-408). The
  OHEM-MSE keeps the reference quirk that ``k`` is computed from ``H*W`` but
  the top-k pool is the flattened ``C*H*W`` per sample.
- :func:`split_channel_ce_loss` — dual CE over a channel split of one joint
  output (keypoint channels + skeleton channels,
  try_skeleton_and_keypoints.py:423-435).
- :func:`per_stack_ce` / :func:`per_stack_mse` — sum over stack outputs.

OHEM top-k is implemented as a descending sort + prefix mask so ``k`` may be
a traced scalar (no re-compilation when the annealed fraction changes per
epoch); for any ``k`` this is numerically identical to ``lax.top_k`` + mean.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _log_softmax_nll(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Per-pixel negative log-likelihood. logits (N,H,W,C), target (N,H,W) int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]


def ce_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """``nn.CrossEntropyLoss`` (mean over all pixels)."""
    return jnp.mean(_log_softmax_nll(logits, target))


def _topk_mean(per_sample: jax.Array, k) -> jax.Array:
    """Mean of the k largest entries of each row of (N, M), over all rows.

    Equivalent to ``torch.topk(x, k, dim=-1)[0].mean()``. ``k`` may be traced.
    """
    n, m = per_sample.shape
    desc = -jnp.sort(-per_sample, axis=-1)  # descending
    idx = jnp.arange(m)[None, :]
    mask = (idx < k).astype(desc.dtype)
    total = jnp.sum(desc * mask)
    count = jnp.maximum(k, 1) * n
    return total / count


def ohem_ce_loss(
    logits: jax.Array, target: jax.Array, fraction, floor: float = 0.1
) -> jax.Array:
    """Bootstrapped CE (/root/reference/train.py:343-362).

    ``k = int(H * W * max(fraction, floor))``; top-k over the per-sample
    flattened pixel losses; mean over the kept losses.
    """
    n, h, w, _ = logits.shape
    fraction = jnp.maximum(jnp.asarray(fraction, jnp.float32), floor)
    k = (h * w * fraction).astype(jnp.int32)
    nll = _log_softmax_nll(logits, target).reshape(n, h * w)
    return _topk_mean(nll, k)


def combined_ohem_ce_loss(
    logits: jax.Array, target: jax.Array, fraction, floor: float = 0.1
) -> jax.Array:
    """OHEM CE + plain CE (/root/reference/train.py:887-888)."""
    return ohem_ce_loss(logits, target, fraction, floor) + ce_loss(logits, target)


def masked_ce_loss(
    logits: jax.Array, target: jax.Array, mask: jax.Array,
    reduction: str = "mean",
) -> jax.Array:
    """CE weighted by a (N,H,W) mask. ``reduction='mean'`` averages over ALL
    pixels (/root/reference/train.py:365-376); ``'sum_mean'`` sums per sample
    and averages over the batch — the try_remove_background variant
    (/root/reference/try_remove_background_and_costomer_loss.py:180-184)."""
    nll = _log_softmax_nll(logits, target) * mask.astype(jnp.float32)
    if reduction == "sum_mean":
        return jnp.mean(jnp.sum(nll.reshape(nll.shape[0], -1), axis=1))
    return jnp.mean(nll)


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """``nn.MSELoss`` (mean)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(jnp.square(pred - target))


def masked_mse_loss(
    pred: jax.Array, target: jax.Array, mask: jax.Array,
    reduction: str = "mean",
) -> jax.Array:
    """MSE weighted by a (N,H,W) mask broadcast over channels.
    ``reduction='mean'`` averages over all elements
    (/root/reference/train.py:379-391); ``'sum_mean'`` sums per sample and
    averages over the batch (/root/reference/
    try_remove_background_and_costomer_loss.py:194-198)."""
    sq = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    sq = sq * mask[..., None].astype(jnp.float32)
    if reduction == "sum_mean":
        return jnp.mean(jnp.sum(sq.reshape(sq.shape[0], -1), axis=1))
    return jnp.mean(sq)


def ohem_mse_loss(
    pred: jax.Array, target: jax.Array, fraction, floor: float = 0.25
) -> jax.Array:
    """OHEM MSE (/root/reference/train.py:394-408).

    Reference quirk kept: ``k = int(H*W*fraction)`` but the pool is the
    flattened (C*H*W) per-sample squared-error vector.
    """
    n, h, w, _ = pred.shape
    fraction = jnp.maximum(jnp.asarray(fraction, jnp.float32), floor)
    k = (h * w * fraction).astype(jnp.int32)
    sq = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)).reshape(n, -1)
    return _topk_mean(sq, k)


def split_channel_ce_loss(
    logits: jax.Array,
    target_a: jax.Array,
    target_b: jax.Array,
    split: int,
) -> jax.Array:
    """Dual CE over a channel split of a joint output
    (/root/reference/try_skeleton_and_keypoints.py:423-435): CE of channels
    [:split] against ``target_a`` plus CE of channels [split:] against
    ``target_b`` (18/20 in the reference 38-channel config)."""
    return ce_loss(logits[..., :split], target_a) + ce_loss(logits[..., split:], target_b)


def per_stack_ce(outputs: Sequence[jax.Array], target: jax.Array) -> jax.Array:
    """Sum of plain CE over all stack outputs (/root/reference/try_skeleton.py:407-411)."""
    return sum(ce_loss(o, target) for o in outputs)


def per_stack_mse(outputs: Sequence[jax.Array], target: jax.Array) -> jax.Array:
    """Sum of MSE over all stack outputs (/root/reference/try_with_torch.py:333-341)."""
    return sum(mse_loss(o, target) for o in outputs)
