"""On-device augmentation as explicit-PRNG coordinate transforms.

The reference augments on the host with PIL objects per sample
(/root/reference/train.py:250-253): ``Rescale(320)`` (image resized to
320x320, label coordinates scaled into /4 map space, train.py:100-132),
``RandomCrop(256)`` (integer top/left in [0, size-256), labels shifted by
offset/4 and clamped at 0 — the reference clamps only the low side,
train.py:168-201), ``RandomHorizontalFlip`` (x -> |x - w/4| with NO
left/right joint relabeling — a documented reference quirk,
train.py:135-165), then torchvision ColorJitter(0.1, 0.1, 0.1, 0.1).

Here the whole geometric chain is composed into ONE gather per output pixel
(no intermediate 320x320 image) and the label-coordinate math is applied
analytically, so everything after JPEG decode runs inside XLA. Randomness is
explicit jax.random keys (SURVEY.md §5: nondeterminism controlled via PRNG
threading).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentParams(NamedTuple):
    """Sampled per-image augmentation parameters."""

    src_h: jax.Array  # () original image height
    src_w: jax.Array  # () original image width
    crop_top: jax.Array  # () int in [0, rescale_size - crop_size)
    crop_left: jax.Array
    flip: jax.Array  # () bool


def sample_augment_params(
    key: jax.Array,
    src_h,
    src_w,
    rescale_size: int = 320,
    crop_size: int = 256,
    flip_prob: float = 0.5,
) -> AugmentParams:
    """Sample crop offsets and flip like the reference
    (np.random.randint(0, h - new_h), train.py:190-191; random() < 0.5,
    train.py:154)."""
    k1, k2, k3 = jax.random.split(key, 3)
    hi = rescale_size - crop_size
    top = jax.random.randint(k1, (), 0, hi)
    left = jax.random.randint(k2, (), 0, hi)
    flip = jax.random.uniform(k3, ()) < flip_prob
    return AugmentParams(
        jnp.asarray(src_h), jnp.asarray(src_w), top, left, flip
    )


def augment_image(
    image: jax.Array,
    params: AugmentParams,
    rescale_size: int = 320,
    crop_size: int = 256,
    method: str = "bilinear",
) -> jax.Array:
    """Apply rescale -> crop -> hflip as a single composed gather.

    Args:
      image: (H, W, 3) float image in [0, 1].
      method: 'nearest' or 'bilinear' source sampling. NOTE: on the DEFAULT
        pipeline the image path is PIL-EXACT regardless of this choice —
        HostLoader stages with PIL's own ``resize`` (the reference's
        Rescale call, train.py:122) and passes a rescale-identity source
        here (src == rescale_size, data/pipeline.py:77-84), so every sample
        lands on integer coordinates and bilinear weights collapse to exact
        pixel copies for the crop+flip (pinned byte-for-byte against the
        imported reference transforms in tests/test_augment.py::
        TestImagePathPILParity). ``method`` only matters when callers feed
        a non-staged source of a different size.
    Returns:
      (crop_size, crop_size, 3) augmented image.
    """
    xo = jnp.arange(crop_size, dtype=jnp.float32)
    yo = jnp.arange(crop_size, dtype=jnp.float32)
    # Un-flip output x to pre-flip crop coordinates.
    xo = jnp.where(params.flip, (crop_size - 1) - xo, xo)
    # Crop offset into the rescaled image, then map to source pixels. PIL's
    # resize samples source coordinate (i + 0.5) * src/dst - 0.5 for linear
    # filters; nearest uses floor((i + 0.5) * src/dst).
    sx = (xo + params.crop_left + 0.5) * (params.src_w.astype(jnp.float32) / rescale_size)
    sy = (yo + params.crop_top + 0.5) * (params.src_h.astype(jnp.float32) / rescale_size)

    if method == "nearest":
        ix = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, params.src_w - 1)
        iy = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, params.src_h - 1)
        return image[iy][:, ix]
    elif method == "bilinear":
        sx = sx - 0.5
        sy = sy - 0.5
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, params.src_w - 1)
        x1 = jnp.clip(x0 + 1, 0, params.src_w - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, params.src_h - 1)
        y1 = jnp.clip(y0 + 1, 0, params.src_h - 1)
        fx = jnp.clip(sx - x0, 0.0, 1.0)
        fy = jnp.clip(sy - y0, 0.0, 1.0)
        top = image[y0][:, x0] * (1 - fx)[None, :, None] + image[y0][:, x1] * fx[None, :, None]
        bot = image[y1][:, x0] * (1 - fx)[None, :, None] + image[y1][:, x1] * fx[None, :, None]
        return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    raise ValueError(f"unknown method {method!r}")


def augment_coords(
    xy: jax.Array,
    params: AugmentParams,
    rescale_size: int = 320,
    crop_size: int = 256,
) -> jax.Array:
    """Apply the reference's label-coordinate chain to (..., 2) (x, y) points.

    Exactly (train.py:126-130, 196-199, 158-161):
      rescale:  c' = c * rescale/src/4          (into /4 map space)
      crop:     c' = max(c' - offset/4, 0)      (clamped at 0 only)
      flip:     x' = |x' - crop/4|              (y untouched; NO joint swap)
    Output coordinates live in the (crop_size/4)² label map.
    """
    x = xy[..., 0] * (rescale_size / 4.0) / params.src_w.astype(jnp.float32)
    y = xy[..., 1] * (rescale_size / 4.0) / params.src_h.astype(jnp.float32)
    x = jnp.maximum(x - params.crop_left.astype(jnp.float32) / 4.0, 0.0)
    y = jnp.maximum(y - params.crop_top.astype(jnp.float32) / 4.0, 0.0)
    x = jnp.where(params.flip, jnp.abs(x - crop_size / 4.0), x)
    return jnp.stack([x, y], axis=-1)


def resize_coords_plain(
    xy: jax.Array, src_h, src_w, inputsize: int = 256
) -> jax.Array:
    """MPII path: plain resize to `inputsize`, labels scaled into /4 map
    space (train.py:676-677): c' = c * inputsize / src / 4."""
    x = xy[..., 0] * (inputsize / 4.0) / jnp.asarray(src_w, jnp.float32)
    y = xy[..., 1] * (inputsize / 4.0) / jnp.asarray(src_h, jnp.float32)
    return jnp.stack([x, y], axis=-1)
