"""Mean-field dense-CRF refinement, on device (jnp).

The reference optionally refines predicted maps with pydensecrf (C++):
unary from softmax + a Gaussian spatial pairwise + a bilateral (color-aware)
pairwise, MAX_ITER mean-field steps with the constants at
/root/reference/try_different_stack.py:39-44 (POS_XY_STD=1, POS_W=3,
Bi_XY_STD=67, Bi_RGB_STD=3, Bi_W=4; dense_crf at 332-349). pydensecrf's
permutohedral-lattice message passing over ALL pixel pairs is replaced here
with truncated-window filtering, which is a *near-field approximation*: the
spatial kernel (sxy=1) is captured fully at the default radius, while the
reference's very wide bilateral kernel (sxy=67) is flat inside any practical
window, so the local bilateral reduces to a color-weighted average over the
window — the long-range component of the dense kernel is intentionally
dropped to stay a static-shape XLA program. Message passing excludes the
self pixel (as pydensecrf subtracts Q before the compatibility transform),
and window shifts are zero-padded, never wrapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _spatial_filter(q: jax.Array, sigma: float, radius: int) -> jax.Array:
    """Separable Gaussian blur over (H, W) for each class channel, with the
    center (self) contribution removed. q: (H, W, C). Zero padding at the
    borders ('same' convolution) — no wraparound."""
    k = _gaussian_kernel1d(sigma, radius)
    qT = jnp.moveaxis(q, -1, 0)  # (C, H, W)
    qT = jax.vmap(
        lambda m: jax.scipy.signal.convolve2d(m, k[:, None], mode="same")
    )(qT)
    qT = jax.vmap(
        lambda m: jax.scipy.signal.convolve2d(m, k[None, :], mode="same")
    )(qT)
    blurred = jnp.moveaxis(qT, 0, -1)
    center = k[radius] ** 2  # self weight of the separable 2D kernel
    return blurred - center * q


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift (H, W, C) by (dy, dx) with zero fill (NOT wraparound)."""
    h, w = x.shape[:2]
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0))
    xp = jnp.pad(x, pad)
    return xp[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


def _bilateral_weights(img: jax.Array, sxy: float, srgb: float, radius: int):
    """Per-offset bilateral weights (spatial Gaussian x color Gaussian),
    excluding the (0,0) self offset. Loop-invariant across mean-field
    iterations, so computed ONCE before the scan. img: (H, W, 3) in [0, 255]
    like pydensecrf's rgbim. Returns (offsets, weights, norm): weights[k] is
    (H, W, 1) for offsets[k], norm the per-pixel neighbor-weight sum (zero
    weight where the shifted pixel falls outside the image)."""
    h, w = img.shape[:2]
    offsets, weights = [], []
    norm = jnp.zeros((h, w, 1), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            simg = _shift2d(img, dy, dx)
            inside = _shift2d(jnp.ones((h, w, 1), jnp.float32), dy, dx)
            sw = jnp.exp(-0.5 * (dy * dy + dx * dx) / (sxy * sxy))
            cw = jnp.exp(
                -0.5 * jnp.sum(jnp.square(img - simg), axis=-1, keepdims=True)
                / (srgb * srgb)
            )
            wgt = sw * cw * inside
            offsets.append((dy, dx))
            weights.append(wgt)
            norm = norm + wgt
    return offsets, weights, jnp.maximum(norm, 1e-8)


def dense_crf(
    img: jax.Array,
    probs: jax.Array,
    n_iters: int = 10,
    pos_xy_std: float = 1.0,
    pos_w: float = 3.0,
    bi_xy_std: float = 67.0,
    bi_rgb_std: float = 3.0,
    bi_w: float = 4.0,
    radius: int = 4,
) -> jax.Array:
    """Mean-field inference with the reference's pydensecrf constants as
    defaults (/root/reference/try_different_stack.py:39-44). img (H, W, 3)
    in [0, 1]; probs (H, W, C) softmax output. Returns refined (H, W, C)."""
    unary = -jnp.log(jnp.clip(probs, 1e-8, 1.0))
    img255 = img * 255.0
    offsets, bi_wgts, bi_norm = _bilateral_weights(
        img255, bi_xy_std, bi_rgb_std, radius
    )

    def bilateral(q):
        out = jnp.zeros_like(q)
        for (dy, dx), wgt in zip(offsets, bi_wgts):
            out = out + _shift2d(q, dy, dx) * wgt
        return out / bi_norm

    def step(q, _):
        # Neighbor-only messages (self excluded inside both filters).
        msg = pos_w * _spatial_filter(q, pos_xy_std, radius) + bi_w * bilateral(q)
        # compatibility = Potts: penalize mass on OTHER labels
        energy = unary - msg
        q = jax.nn.softmax(-energy, axis=-1)
        return q, None

    q, _ = jax.lax.scan(step, probs, None, length=n_iters)
    return q
