"""Mean-field dense-CRF refinement, on device (jnp).

The reference optionally refines predicted maps with pydensecrf (C++):
unary from softmax + a Gaussian spatial pairwise + a bilateral (color-aware)
pairwise, MAX_ITER mean-field steps with the constants at
/root/reference/try_different_stack.py:39-44 (POS_XY_STD=1, POS_W=3,
Bi_XY_STD=67, Bi_RGB_STD=3, Bi_W=4; dense_crf at 332-349).

Two implementations, one algorithm:

- :func:`dense_crf_exact` -- the FULL dense pairwise model (every pixel
  pair, including the wide sxy=67 bilateral) as (N,N)@(N,C) MXU matmuls
  per mean-field step. pydensecrf needs a permutohedral lattice because
  O(N^2) is hopeless on CPU; on TPU the O(N^2) form IS the fast form at the
  64x64 heatmap size the reference refines (~0.6 GFLOP/iteration). This is
  the ``cli.predict --crf`` default.
- :func:`dense_crf` -- truncated-window approximation (static small-window
  filtering). The spatial kernel (sxy=1) is captured fully at the default
  radius; the long-range bilateral is dropped. Measured gap vs exact at
  16x16 (tests/test_variants.py::TestDenseCRFExact): mean TV ~0.04, argmax
  agreement ~97%, but per-pixel TV up to ~0.77 on ambiguous pixels -- use
  only when the quadratic kernel is too large (maps >> 64^2).

Both: message passing excludes the self pixel (as pydensecrf subtracts Q
before the compatibility transform); window shifts / borders are
zero-padded, never wrapped; windowed(radius >= map extent) == exact is
pinned by test.
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
    # Explicit zero-pad + 'valid' instead of 'same': convolve2d('same')
    # rejects kernels larger than the image, which a radius >= map extent
    # (e.g. the full-support cross-check against dense_crf_exact) produces.
    # precision='highest': the default conv precision rounds operands to
    # bf16-class precision, which measurably (0.1-0.2% per weight) distorts
    # the effective kernel — enough to break the windowed==exact
    # cross-check against dense_crf_exact's fp32 matmuls.
    qT = jax.vmap(
        lambda m: jax.scipy.signal.convolve2d(
            jnp.pad(m, ((radius, radius), (0, 0))), k[:, None], mode="valid",
            precision="highest")
    )(qT)
    qT = jax.vmap(
        lambda m: jax.scipy.signal.convolve2d(
            jnp.pad(m, ((0, 0), (radius, radius))), k[None, :], mode="valid",
            precision="highest")
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


def dense_crf_exact(
    img: jax.Array,
    probs: jax.Array,
    n_iters: int = 10,
    pos_xy_std: float = 1.0,
    pos_w: float = 3.0,
    bi_xy_std: float = 67.0,
    bi_rgb_std: float = 3.0,
    bi_w: float = 4.0,
) -> jax.Array:
    """FULL-support dense mean-field — :func:`dense_crf`'s radius→∞ limit
    with no truncation, i.e. the reference's truly dense pairwise model
    (pydensecrf, /root/reference/try_different_stack.py:332-349) including
    the wide (sxy=67) bilateral kernel over ALL pixel pairs.

    pydensecrf routes the dense filtering through a permutohedral lattice
    because an O(N²) kernel is hopeless on CPU; on TPU the O(N²) form IS the
    fast form — two (N, N) @ (N, C) matmuls per mean-field step land on the
    MXU (at the 64x64 heatmap size the reference refines, N=4096: ~0.6
    GFLOP/iteration). Pairwise weights are computed once (loop-invariant).

    Semantics mirror :func:`dense_crf` exactly so the pair is one algorithm
    at two supports (the fuzz tests pin windowed(radius>=map) == exact):
    self-interaction excluded, spatial kernel separably normalized by the
    full kernel mass (no per-pixel border renormalization — zero-padding
    semantics), bilateral normalized per pixel over its neighbors.
    """
    h, w, c = probs.shape
    n = h * w
    f32 = jnp.float32

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pos = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1).astype(f32)
    dy = pos[:, None, 0] - pos[None, :, 0]
    dx = pos[:, None, 1] - pos[None, :, 1]
    d2 = dy * dy + dx * dx
    eye = jnp.eye(n, dtype=f32)

    # Spatial kernel: separable Gaussian normalized over the FULL support
    # (the windowed _spatial_filter's 1D normalization taken to radius→∞).
    r_full = max(h, w)
    g = jnp.exp(-0.5 * (jnp.arange(-r_full, r_full + 1, dtype=f32)
                        / pos_xy_std) ** 2)
    z1 = jnp.sum(g)
    ks = jnp.exp(-0.5 * (dy / pos_xy_std) ** 2) / z1 \
        * jnp.exp(-0.5 * (dx / pos_xy_std) ** 2) / z1
    ks = ks * (1.0 - eye)

    # Bilateral kernel over all pairs, self excluded, per-pixel normalized.
    img255 = (img * 255.0).astype(f32).reshape(n, 3)
    cd2 = jnp.sum(
        jnp.square(img255[:, None, :] - img255[None, :, :]), axis=-1)
    wb = jnp.exp(-0.5 * d2 / (bi_xy_std * bi_xy_std)) * jnp.exp(
        -0.5 * cd2 / (bi_rgb_std * bi_rgb_std))
    wb = wb * (1.0 - eye)
    wb = wb / jnp.maximum(jnp.sum(wb, axis=1, keepdims=True), 1e-8)

    unary = -jnp.log(jnp.clip(probs, 1e-8, 1.0)).reshape(n, c)

    hi = jax.lax.Precision.HIGHEST  # fp32-faithful on TPU (no bf16 passes)

    def step(q, _):
        msg = pos_w * jnp.matmul(ks, q, precision=hi) \
            + bi_w * jnp.matmul(wb, q, precision=hi)
        q = jax.nn.softmax(-(unary - msg), axis=-1)
        return q, None

    q, _ = jax.lax.scan(step, probs.reshape(n, c), None, length=n_iters)
    return q.reshape(h, w, c)
