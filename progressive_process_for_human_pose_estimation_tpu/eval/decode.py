"""On-device heatmap → keypoint decoding (SURVEY.md §2.2.12).

Covers the reference's inference decode family:

- :func:`argmax_decode` — per-channel argmax (+ confidence threshold),
  coordinates scaled x4 back to input resolution
  (/root/reference/train.py:1060-1068).
- :func:`normalized_peak_decode` — per-channel min-max normalization, every
  pixel above the threshold is a detection
  (/root/reference/try_different_stack.py:485-498).
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
    heatmaps: jax.Array, threshold: float = 0.7
) -> Tuple[jax.Array, jax.Array]:
    """Min-max-normalized threshold decode
    (/root/reference/try_different_stack.py:485-498): each channel is
    min-max normalized to [0, 1] and EVERY pixel above the threshold is a
    detection — the reference draws them all (coordinates x4 on the host:
    ``np.where(mask) * 4``), so this returns the per-pixel mask, not a
    single peak.

    Args:
      heatmaps: (N, H, W, C).
    Returns:
      mask: (N, H, W, C) bool — normalized value > threshold.
      norm: (N, H, W, C) the min-max normalized maps.
    """
    n, h, w, c = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, c)
    mn = jnp.min(flat, axis=1, keepdims=True)
    mx = jnp.max(flat, axis=1, keepdims=True)
    norm = (flat - mn) / jnp.maximum(mx - mn, 1e-12)
    norm = norm.reshape(n, h, w, c)
    return norm > threshold, norm


def local_max_nms(heatmaps: jax.Array, window: int = 3) -> jax.Array:
    """3x3 (or window²) local-maximum mask — ``ndimage.maximum_filter(x, w)
    == x`` as a reduce_window on device.

    Args:
      heatmaps: (N, H, W, C).
    Returns:
      (N, H, W, C) bool mask of local maxima.
    """
    # Asymmetric padding keeps the output H x W for even windows too
    # ((w-1)//2 before, w//2 after = w-1 total = window-1 overlap).
    lo, hi = (window - 1) // 2, window // 2
    neighborhood_max = jax.lax.reduce_window(
        heatmaps,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (lo, hi), (lo, hi), (0, 0)],
    )
    return heatmaps >= neighborhood_max
