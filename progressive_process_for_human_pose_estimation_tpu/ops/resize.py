"""Torch-parity spatial resize/pool ops, NHWC, jit-friendly.

The reference mixes three resize semantics (all on NCHW torch tensors; we are
NHWC throughout):

- ``F.interpolate(x, scale_factor=2)`` — *nearest* upsampling (the default
  mode), used by the final-model hourglass decoder
  (/root/reference/train.py:530-541) and the classic baseline
  (/root/reference/hourglass_compare.py:524-537).
- ``F.interpolate(x, scale_factor=2, mode='bilinear', align_corners=True)`` —
  used by the recursive weight-shared hourglass
  (/root/reference/only_one_hourgless.py:195) and to broadcast the ASPP
  global-pool branch (/root/reference/train.py:491).
- ``nn.MaxPool2d(2, 2)`` — classic-hourglass downsampling
  (/root/reference/hourglass_compare.py:497-509).

Everything here lowers to gathers/reduce_window with static shapes so XLA can
fuse it into the surrounding convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample of an NHWC tensor.

    Matches ``F.interpolate(scale_factor=2)`` (mode='nearest'): output pixel
    (i, j) takes input pixel (i // 2, j // 2).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) align_corners=True interpolation matrix: row d holds the two
    lerp weights at src = d * (in-1)/(out-1)."""
    a = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        a[:, 0] = 1.0
        return a
    src = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    a[np.arange(out_size), lo] += 1.0 - frac
    a[np.arange(out_size), hi] += frac
    return a


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True semantics (NHWC).

    src coordinate for output index d is ``d * (in - 1) / (out - 1)`` (and 0
    when out == 1), exactly torch's ``F.interpolate(..., mode='bilinear',
    align_corners=True)``.

    Implemented as two small dense matmuls (out = A_r @ x @ A_c^T) rather
    than gathers: on TPU the gather formulation measured 2.3 ms for a
    32→64 upsample at batch 64 x 256ch — 3x a whole residual block — while
    the MXU eats these matmuls in tens of microseconds.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    a_r = jnp.asarray(_interp_matrix(h, out_h), x.dtype)  # (out_h, h)
    a_c = jnp.asarray(_interp_matrix(w, out_w), x.dtype)  # (out_w, w)
    # Keep the channel axis minor throughout (both transposes permute major
    # dims only, avoiding lane-crossing relayouts).
    y = jax.lax.dot_general(
        a_r, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)  # (out_h, n, w, c)
    y = jnp.transpose(y, (1, 0, 2, 3))  # (n, out_h, w, c)
    y = jax.lax.dot_general(
        a_c, y, (((1,), (2,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)  # (out_w, n, out_h, c)
    return jnp.transpose(y, (1, 2, 0, 3))


def upsample2x_bilinear_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=True (recursive-hourglass decoder)."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """``nn.MaxPool2d(2, 2)`` on NHWC: non-overlapping 2x2 max windows.

    Formulation settled by the round-4 maxpool attack (ROUND4_NOTES), which
    measured BOTH in isolation and end-to-end on chip. In per-op isolation
    a strided-slice form (``max(x[:,:,0::2], x[:,:,1::2])`` then rows) beats
    reduce_window at every flagship level — 0.0562 vs 0.0683 ms @64²,
    0.0120 vs 0.0536 @32², 0.0034 vs 0.0650 @16² (batch 8, 256 ch) — i.e.
    reduce_window standalone has a fixed-overhead pathology at small
    spatial. But in the FULL flagship graph the ranking inverts:
    reduce_window 1540.7 vs strided 1478.4 img/s median over 4 interleaved
    same-session reps (non-overlapping ranges, ~4%). XLA fuses the
    reduce_window into the surrounding convs, so the isolated glue
    milliseconds never appear in context, while the strided slices force
    worse layouts. Kept: reduce_window. (The round-2 note's reshape+max
    alternative loses to both.)
    """
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """``nn.AdaptiveAvgPool2d((1, 1))`` on NHWC → (N, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
