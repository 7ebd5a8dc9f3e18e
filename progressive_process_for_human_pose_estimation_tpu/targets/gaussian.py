"""On-device Gaussian heatmap target rendering.

Replicates both reference forms (SURVEY.md §2.2.1):

- unnormalized ``exp(-((x-x0)² + (y-y0)²) / (2σ²))``
  (/root/reference/read_mscoco.py:46-65, try_with_torch.py:113-130),
  accumulated with ``+=`` across persons
  (/root/reference/hourglass_compare.py:300-313);
- 1/(2πσ²)-normalized form for the LSP loader
  (/root/reference/data_argumentation.py:37-50).

Output is channel-last (H, W, K) for NHWC consistency (the reference is
(K, H, W)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_heatmaps(
    centers: jax.Array,
    valid: jax.Array,
    h: int,
    w: int,
    sigma: float = 1.0,
    normalized: bool = False,
) -> jax.Array:
    """Render per-keypoint Gaussian heatmaps.

    Args:
      centers: (..., K, 2) float (x, y) keypoint coordinates in output-map
        pixels. Leading axes (e.g. persons) are accumulated by summation,
        matching the reference's ``+=`` across annotations.
      valid: (..., K) bool visibility.
      h, w: output map size.
      sigma: Gaussian σ (reference: 1).
      normalized: multiply by 1/(2πσ²) (LSP form) when True.

    Returns:
      (h, w, K) float32 heatmaps.
    """
    k = centers.shape[-2]
    centers = centers.reshape(-1, k, 2).astype(jnp.float32)  # (P, K, 2)
    valid = valid.reshape(-1, k)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]  # (h, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, w)

    dx = xs[None, None] - centers[:, :, 0][..., None, None]  # (P, K, h, w)
    dy = ys[None, None] - centers[:, :, 1][..., None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    if normalized:
        g = g / (2.0 * jnp.pi * sigma * sigma)
    g = g * valid[..., None, None].astype(jnp.float32)
    return jnp.transpose(jnp.sum(g, axis=0), (1, 2, 0))  # (h, w, K)
