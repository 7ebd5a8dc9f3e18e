"""On-device heatmap → keypoint decoding (SURVEY.md §2.2.12).

Covers the reference's inference decode family:

- :func:`argmax_decode` — per-channel argmax (+ confidence threshold),
  coordinates scaled x4 back to input resolution
  (/root/reference/train.py:1060-1068).
- :func:`normalized_peak_decode` — peak accepted when value / channel-max of
  a normalized map exceeds a threshold
  (/root/reference/try_different_stack.py:487-498).
- :func:`local_max_nms` — 3x3 local-maximum suppression, the
  ``ndimage.maximum_filter`` equivalent
  (/root/reference/try_different_stack_without_skeleton.py:486-492;
  skimage.peak_local_max imported at train.py:26) as a reduce_window
  compare — no host round-trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def argmax_decode(
    heatmaps: jax.Array, threshold: float = 1.0, scale: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """Per-channel argmax decode (/root/reference/train.py:1060-1068).

    Args:
      heatmaps: (N, H, W, C) channel-last maps (softmaxed or raw logits,
        matching the reference's use of ``result[...]`` directly).
    Returns:
      coords: (N, C, 2) int32 (x, y) in input-resolution pixels (x scale).
      valid: (N, C) bool — peak value > threshold.
    """
    n, h, w, c = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, c)
    idx = jnp.argmax(flat, axis=1)  # (N, C), row-major first max
    peak = jnp.max(flat, axis=1)
    ys, xs = idx // w, idx % w
    coords = jnp.stack([xs * scale, ys * scale], axis=-1).astype(jnp.int32)
    return coords, peak > threshold


def normalized_peak_decode(
    heatmaps: jax.Array, threshold: float = 0.5, scale: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """Normalized-peak decode (/root/reference/try_different_stack.py:487-498):
    each channel is divided by its max before thresholding, so the threshold
    is relative."""
    n, h, w, c = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, c)
    mx = jnp.max(flat, axis=1, keepdims=True)
    norm = flat / jnp.where(mx > 0, mx, 1.0)
    idx = jnp.argmax(norm, axis=1)
    peak = jnp.max(norm, axis=1)
    ys, xs = idx // w, idx % w
    coords = jnp.stack([xs * scale, ys * scale], axis=-1).astype(jnp.int32)
    return coords, peak > threshold


def local_max_nms(heatmaps: jax.Array, window: int = 3) -> jax.Array:
    """3x3 (or window²) local-maximum mask — ``ndimage.maximum_filter(x, w)
    == x`` as a reduce_window on device.

    Args:
      heatmaps: (N, H, W, C).
    Returns:
      (N, H, W, C) bool mask of local maxima.
    """
    pad = window // 2
    neighborhood_max = jax.lax.reduce_window(
        heatmaps,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return heatmaps >= neighborhood_max
