"""Synthetic pose dataset: manifest-shaped random data for tests/demos/bench.

The real datasets (LSP/MPII/COCO) are not bundled; this generates
structurally identical records — random articulated "persons" with plausible
joint layouts, silhouette polygons around them, and images with joint-aligned
blobs so that training has learnable signal. Serves the role of
dataset_check.py's smoke data (SURVEY.md §4) without the datasets.
"""

from __future__ import annotations

import numpy as np

from ..models.recursive import COCO_SKELETON
from .manifests import Manifest, N_JOINTS_COCO, N_JOINTS_LSP, N_JOINTS_MPII


def synthetic_coco_manifest(
    n_images: int = 64,
    max_persons: int = 4,
    max_vertices: int = 16,
    img_size: int = 256,
    seed: int = 0,
) -> Manifest:
    rng = np.random.default_rng(seed)
    kps = np.zeros((n_images, max_persons, N_JOINTS_COCO, 3), np.float32)
    polys = np.zeros((n_images, max_persons, max_vertices, 2), np.float32)
    n_verts = np.zeros((n_images, max_persons), np.int32)
    n_persons = rng.integers(1, max_persons + 1, (n_images,)).astype(np.int32)
    dims = np.full((n_images, 2), img_size, np.int32)

    for i in range(n_images):
        for p in range(n_persons[i]):
            cx, cy = rng.uniform(0.25 * img_size, 0.75 * img_size, 2)
            spread = rng.uniform(0.08, 0.2) * img_size
            joints = np.stack(
                [
                    np.clip(cx + rng.normal(0, spread, N_JOINTS_COCO), 0, img_size - 1),
                    np.clip(cy + rng.normal(0, spread, N_JOINTS_COCO), 0, img_size - 1),
                ],
                axis=1,
            )
            vis = (rng.random(N_JOINTS_COCO) > 0.2).astype(np.float32) * 2.0
            kps[i, p] = np.concatenate([joints, vis[:, None]], axis=1)
            nv = int(rng.integers(6, max_vertices + 1))
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            rad = rng.uniform(0.7, 1.6, nv) * spread
            polys[i, p, :nv, 0] = np.clip(cx + rad * np.cos(ang), 0, img_size - 1)
            polys[i, p, :nv, 1] = np.clip(cy + rad * np.sin(ang), 0, img_size - 1)
            n_verts[i, p] = nv

    return {
        "image_names": np.asarray([f"synthetic_{i:06d}" for i in range(n_images)]),
        "image_dims": dims,
        "keypoints": kps,
        "polygons": polys,
        "n_vertices": n_verts,
        "n_persons": n_persons,
        "skeleton": COCO_SKELETON,
        "truncation_counts": np.zeros(2, np.int64),
    }


def synthetic_mpii_manifest(
    n_images: int = 32, img_size: int = 256, seed: int = 0
) -> Manifest:
    """MPII-schema synthetic manifest: one person per image, 16 joints,
    head rectangle around the head-top joint (id 9) — structurally identical
    to :func:`..manifests.build_mpii_manifest` output so the whole MPII
    train/eval path (renderer, splits, head-rect PCKh) runs without the real
    RELEASE .mat."""
    rng = np.random.default_rng(seed)
    kps = np.zeros((n_images, N_JOINTS_MPII, 3), np.float32)
    rects = np.zeros((n_images, 4), np.float32)
    dims = np.full((n_images, 2), img_size, np.int32)
    for i in range(n_images):
        cx, cy = rng.uniform(0.3 * img_size, 0.7 * img_size, 2)
        spread = rng.uniform(0.1, 0.2) * img_size
        xy = np.stack(
            [
                np.clip(cx + rng.normal(0, spread, N_JOINTS_MPII), 0, img_size - 1),
                np.clip(cy + rng.normal(0, spread, N_JOINTS_MPII), 0, img_size - 1),
            ],
            axis=1,
        )
        vis = (rng.random(N_JOINTS_MPII) > 0.1).astype(np.float32)
        kps[i] = np.concatenate([xy, vis[:, None]], axis=1)
        hx, hy = xy[9]  # MPII joint 9 = head top
        r = 0.08 * img_size
        rects[i] = [hx - r, hy - r, hx + r, hy + r]
    return {
        "image_names": np.asarray([f"synthetic_{i:06d}" for i in range(n_images)]),
        "image_dims": dims,
        "keypoints": kps,
        "head_rects": rects,
        "release_indices": np.arange(n_images, dtype=np.int64),
    }


def synthetic_lsp_manifest(
    n_images: int = 32, img_size: int = 256, seed: int = 0
) -> Manifest:
    """LSP-schema synthetic manifest: (N, 14, 3) joints, no head rects
    (the LSP path renders normalized Gaussian targets —
    /root/reference/data_argumentation.py:37-50)."""
    rng = np.random.default_rng(seed)
    kps = np.zeros((n_images, N_JOINTS_LSP, 3), np.float32)
    dims = np.full((n_images, 2), img_size, np.int32)
    for i in range(n_images):
        cx, cy = rng.uniform(0.3 * img_size, 0.7 * img_size, 2)
        spread = rng.uniform(0.1, 0.2) * img_size
        xy = np.stack(
            [
                np.clip(cx + rng.normal(0, spread, N_JOINTS_LSP), 0, img_size - 1),
                np.clip(cy + rng.normal(0, spread, N_JOINTS_LSP), 0, img_size - 1),
            ],
            axis=1,
        )
        kps[i] = np.concatenate([xy, np.ones((N_JOINTS_LSP, 1), np.float32)], axis=1)
    return {
        "image_names": np.asarray([f"synthetic_{i:06d}" for i in range(n_images)]),
        "image_dims": dims,
        "keypoints": kps,
    }


def synthetic_image(record_kps: np.ndarray, img_size: int = 256, seed: int = 0):
    """Render an image with Gaussian blobs at the (visible) joints over
    noise — enough signal for a loss to decrease in smoke training.

    Each blob is evaluated only on a ±6σ window around its joint (the tail
    beyond that is ~2e-16, below fp32 eps of any pixel value), which makes
    rendering O(joints·window²) instead of O(joints·img_size²) — on the
    1-core demo box this is the difference between ~10 s and ~0.2 s per
    16-image epoch of the full-size convergence demos."""
    rng = np.random.default_rng(seed)
    img = rng.random((img_size, img_size, 3)).astype(np.float32) * 0.2
    sigma = 4.0
    r = int(6 * sigma)  # exp(-r^2 / (2 sigma^2)) = exp(-18) ≈ 2e-16
    # Accept both (P, K, 3) multi-person and (K, 3) single-person records.
    record_kps = np.asarray(record_kps).reshape(-1, record_kps.shape[-2], 3)
    for person in record_kps:
        for x, y, v in person:
            if v > 0:
                x0, x1 = max(int(x) - r, 0), min(int(x) + r + 1, img_size)
                y0, y1 = max(int(y) - r, 0), min(int(y) + r + 1, img_size)
                ys = np.arange(y0, y1, dtype=np.float32)[:, None]
                xs = np.arange(x0, x1, dtype=np.float32)[None, :]
                blob = np.exp(
                    -((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma**2)
                )
                img[y0:y1, x0:x1] += 0.6 * blob[:, :, None]
    return np.clip(img, 0, 1)
