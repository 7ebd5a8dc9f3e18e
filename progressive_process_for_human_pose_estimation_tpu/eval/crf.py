"""Mean-field dense-CRF refinement, on device (jnp).

The reference optionally refines predicted maps with pydensecrf (C++):
unary from softmax + a Gaussian spatial pairwise + a bilateral (color-aware)
pairwise, MAX_ITER mean-field steps (/root/reference/try_different_stack.py:
330-349). pydensecrf's permutohedral-lattice message passing is replaced here
with truncated-window Gaussian filtering (spatial) and a local bilateral
filter (joint spatial+color Gaussian), which matches dense-CRF behaviour at
the reference's small sxy scales while staying a static-shape XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _spatial_filter(q: jax.Array, sigma: float, radius: int) -> jax.Array:
    """Separable Gaussian blur over (H, W) for each class channel.
    q: (H, W, C)."""
    k = _gaussian_kernel1d(sigma, radius)
    qT = jnp.moveaxis(q, -1, 0)  # (C, H, W)
    qT = jax.vmap(
        lambda m: jax.scipy.signal.convolve2d(m, k[:, None], mode="same")
    )(qT)
    qT = jax.vmap(
        lambda m: jax.scipy.signal.convolve2d(m, k[None, :], mode="same")
    )(qT)
    return jnp.moveaxis(qT, 0, -1)


def _bilateral_filter(
    q: jax.Array, img: jax.Array, sxy: float, srgb: float, radius: int
) -> jax.Array:
    """Local bilateral message passing: for each offset in a (2r+1)² window,
    weight by spatial Gaussian x color Gaussian. q: (H, W, C), img: (H, W, 3)
    in [0, 255] scale like pydensecrf's rgbim."""
    h, w, c = q.shape
    out = jnp.zeros_like(q)
    norm = jnp.zeros((h, w, 1), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sq = jnp.roll(q, (dy, dx), axis=(0, 1))
            simg = jnp.roll(img, (dy, dx), axis=(0, 1))
            sw = jnp.exp(-0.5 * (dy * dy + dx * dx) / (sxy * sxy))
            cw = jnp.exp(
                -0.5 * jnp.sum(jnp.square(img - simg), axis=-1, keepdims=True)
                / (srgb * srgb)
            )
            wgt = sw * cw
            out = out + sq * wgt
            norm = norm + wgt
    return out / jnp.maximum(norm, 1e-8)


def dense_crf(
    img: jax.Array,
    probs: jax.Array,
    n_iters: int = 10,
    pos_xy_std: float = 3.0,
    pos_w: float = 3.0,
    bi_xy_std: float = 10.0,
    bi_rgb_std: float = 5.0,
    bi_w: float = 5.0,
    radius: int = 4,
) -> jax.Array:
    """Mean-field inference. img (H, W, 3) in [0, 1]; probs (H, W, C)
    softmax output. Returns refined (H, W, C) distribution."""
    unary = -jnp.log(jnp.clip(probs, 1e-8, 1.0))
    img255 = img * 255.0
    q = probs

    def step(q, _):
        msg = pos_w * _spatial_filter(q, pos_xy_std, radius) + bi_w * _bilateral_filter(
            q, img255, bi_xy_std, bi_rgb_std, radius
        )
        # compatibility = Potts: penalize mass on OTHER labels
        energy = unary - (msg - q * (pos_w + bi_w))
        q = jax.nn.softmax(-energy, axis=-1)
        return q, None

    q, _ = jax.lax.scan(step, q, None, length=n_iters)
    return q
