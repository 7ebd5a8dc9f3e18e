"""torchvision-parity ColorJitter, on device with explicit PRNG.

The reference applies ``transforms.ColorJitter(0.1, 0.1, 0.1, 0.1)``
(/root/reference/train.py:253). torchvision samples
brightness/contrast/saturation factors uniformly from [1-j, 1+j], a hue
shift from [-j, j], and applies the four adjustments in a RANDOM ORDER.
All replicated here on (H, W, 3) float images in [0, 1].
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# Plain numpy at module scope: a jnp array here would initialize the XLA
# backend at IMPORT time, which breaks jax.distributed.initialize() in
# multi-host CLI runs (it must run before any backend init). Converted at
# trace time where used.
_PERMS = np.asarray(list(itertools.permutations(range(4))), dtype=np.int32)


def _rgb_to_grayscale(img):
    # torchvision uses ITU-R 601-2 luma (L mode): 0.299 R + 0.587 G + 0.114 B
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    # blend with the mean of the grayscale image
    mean = jnp.mean(_rgb_to_grayscale(img))
    return jnp.clip(mean + factor * (img - mean), 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _rgb_to_grayscale(img)
    return jnp.clip(gray + factor * (img - gray), 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, shift):
    h, s, v = _rgb_to_hsv(img)
    return _hsv_to_rgb((h + shift) % 1.0, s, v)


def color_jitter(
    img: jax.Array,
    key: jax.Array,
    brightness: float = 0.1,
    contrast: float = 0.1,
    saturation: float = 0.1,
    hue: float = 0.1,
) -> jax.Array:
    """torchvision ColorJitter: random factors, random op order."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    def apply_op(img, op_idx):
        return jax.lax.switch(
            op_idx,
            [
                lambda x: adjust_brightness(x, fb),
                lambda x: adjust_contrast(x, fc),
                lambda x: adjust_saturation(x, fs),
                lambda x: adjust_hue(x, fh),
            ],
            img,
        )

    perm = jnp.asarray(_PERMS)[jax.random.randint(kp, (), 0, len(_PERMS))]

    def body(i, im):
        return apply_op(im, perm[i])

    return jax.lax.fori_loop(0, 4, body, img)
