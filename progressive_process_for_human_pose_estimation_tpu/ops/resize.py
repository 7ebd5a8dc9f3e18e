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


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample of an NHWC tensor.

    Matches ``F.interpolate(scale_factor=2)`` (mode='nearest'): output pixel
    (i, j) takes input pixel (i // 2, j // 2).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True semantics (NHWC).

    src coordinate for output index d is ``d * (in - 1) / (out - 1)`` (and 0
    when out == 1), exactly torch's ``F.interpolate(..., mode='bilinear',
    align_corners=True)``.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_coords(in_size: int, out_size: int):
        if out_size == 1 or in_size == 1:
            src = jnp.zeros((out_size,), jnp.float32)
        else:
            src = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.clip(lo + 1, 0, in_size - 1)
        frac = (src - lo.astype(jnp.float32)).astype(x.dtype)
        return lo, hi, frac

    ylo, yhi, yfrac = axis_coords(h, out_h)
    xlo, xhi, xfrac = axis_coords(w, out_w)

    top = x[:, ylo, :, :]
    bot = x[:, yhi, :, :]
    rows = top + (bot - top) * yfrac[None, :, None, None]
    left = rows[:, :, xlo, :]
    right = rows[:, :, xhi, :]
    return left + (right - left) * xfrac[None, None, :, None]


def upsample2x_bilinear_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=True (recursive-hourglass decoder)."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """``nn.MaxPool2d(2, 2)`` on NHWC: non-overlapping 2x2 max windows."""
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
