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


# ---------------------------------------------------------------------------
# Learnable stick-figure dataset (MPII schema).
#
# The blob images above give identical appearance to every joint, so a model
# can learn "jointness" but never joint IDENTITY — training on them plateaus
# near chance PCKh. The stick-figure renderer draws an articulated person
# whose joints carry distinct colors and whose limbs follow the MPII skeleton
# (/root/reference/train.py:75-91), making the image→label-map task fully
# learnable. This is what the convergence-level twin runs and the on-chip
# production training demo train on (VERDICT r4 items 1-2).
# ---------------------------------------------------------------------------

# 16 maximally-distinct joint colors (MPII joint order: r ankle, r knee,
# r hip, l hip, l knee, l ankle, pelvis, thorax, upper neck, head top,
# r wrist, r elbow, r shoulder, l shoulder, l elbow, l wrist).
MPII_JOINT_COLORS = np.array(
    [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
        (255, 0, 255), (0, 255, 255), (255, 128, 0), (128, 0, 255),
        (0, 128, 255), (255, 255, 255), (128, 255, 0), (255, 0, 128),
        (0, 255, 128), (128, 128, 255), (255, 128, 128), (128, 64, 0),
    ],
    np.uint8,
)

# MPII 15-edge skeleton (same order as models.recursive.MPII_SKELETON /
# /root/reference/train.py:75-91); limb colors are the mean of the endpoint
# joint colors dimmed to 45% so limbs are visible but never brighter than the
# joint disks they connect.
_MPII_EDGES = np.array(
    [[0, 1], [1, 2], [2, 6], [6, 3], [3, 4], [4, 5], [6, 7], [7, 8],
     [8, 9], [10, 11], [11, 12], [12, 8], [8, 13], [13, 14], [14, 15]],
    np.int32,
)


def synthetic_person_pose(rng: np.random.Generator, img_size: int) -> np.ndarray:
    """One plausible articulated MPII pose: (16, 3) [x, y, visible].

    An explicit kinematic chain (pelvis → torso → head/limbs) with randomized
    segment angles, so joints are spatially separated the way real people's
    are — unlike the isotropic-normal scatter of synthetic_mpii_manifest."""

    def unit(deg):
        r = np.deg2rad(deg)
        return np.array([np.cos(r), np.sin(r)])

    s = rng.uniform(0.20, 0.32) * img_size  # torso length (pelvis→thorax)
    pelvis = rng.uniform(0.38, 0.62, 2) * img_size
    torso_deg = rng.normal(-90, 12)  # image y points down: -90° = upright
    d = unit(torso_deg)
    perp = np.array([-d[1], d[0]])

    kps = np.zeros((16, 3), np.float32)
    thorax = pelvis + s * d
    neck = thorax + 0.18 * s * unit(torso_deg + rng.normal(0, 8))
    headtop = neck + 0.36 * s * unit(torso_deg + rng.normal(0, 10))
    kps[6, :2], kps[7, :2], kps[8, :2], kps[9, :2] = pelvis, thorax, neck, headtop

    hip_off = 0.17 * s
    kps[2, :2] = pelvis + perp * hip_off   # r hip
    kps[3, :2] = pelvis - perp * hip_off   # l hip
    sho_off = 0.26 * s
    kps[12, :2] = thorax + perp * sho_off  # r shoulder
    kps[13, :2] = thorax - perp * sho_off  # l shoulder

    for hip, knee, ankle in ((2, 1, 0), (3, 4, 5)):
        a1 = 90 + rng.normal(0, 22)        # thigh: downward ± spread
        kps[knee, :2] = kps[hip, :2] + 0.52 * s * unit(a1)
        a2 = a1 + rng.normal(0, 30)
        kps[ankle, :2] = kps[knee, :2] + 0.48 * s * unit(a2)
    for sho, elb, wri in ((12, 11, 10), (13, 14, 15)):
        a1 = 90 + rng.normal(0, 65)        # upper arm: hang ± large spread
        kps[elb, :2] = kps[sho, :2] + 0.38 * s * unit(a1)
        a2 = a1 + rng.normal(0, 45)
        kps[wri, :2] = kps[elb, :2] + 0.36 * s * unit(a2)

    kps[:, :2] = np.clip(kps[:, :2], 3, img_size - 4)
    kps[:, 2] = (rng.random(16) > 0.05).astype(np.float32)
    return kps


def stickfigure_head_rect(kps: np.ndarray) -> np.ndarray:
    """MPII-style head rectangle from the neck→head-top segment (the PCKh
    standard is 0.6 × its diagonal, /root/reference/train.py:782-785)."""
    center = 0.5 * (kps[8, :2] + kps[9, :2])
    half = max(0.75 * float(np.linalg.norm(kps[9, :2] - kps[8, :2])), 6.0)
    return np.array(
        [center[0] - half, center[1] - half, center[0] + half, center[1] + half],
        np.float32,
    )


def stickfigure_image(kps: np.ndarray, img_size: int, seed: int = 0) -> np.ndarray:
    """Render the pose: per-limb colored lines + per-joint colored disks over
    a low-amplitude noise background. float32 HWC in [0, 1]."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    bg = (rng.random((img_size, img_size, 3)) * 40).astype(np.uint8)
    pil = Image.fromarray(bg)
    draw = ImageDraw.Draw(pil)
    lw = max(2, round(0.012 * img_size))
    rj = max(2.5, 0.014 * img_size)
    for e, (a, b) in enumerate(_MPII_EDGES):
        if kps[a, 2] > 0 and kps[b, 2] > 0:
            color = tuple(
                int(c)
                for c in (
                    0.45 * (MPII_JOINT_COLORS[a].astype(np.float32)
                            + MPII_JOINT_COLORS[b].astype(np.float32)) / 2
                )
            )
            draw.line(
                [tuple(kps[a, :2].tolist()), tuple(kps[b, :2].tolist())],
                fill=color, width=lw,
            )
    for j in range(16):
        if kps[j, 2] > 0:
            x, y = float(kps[j, 0]), float(kps[j, 1])
            draw.ellipse(
                [x - rj, y - rj, x + rj, y + rj],
                fill=tuple(int(c) for c in MPII_JOINT_COLORS[j]),
            )
    return np.asarray(pil, np.float32) / 255.0


# COCO joint order: nose, l/r eye, l/r ear, l/r shoulder, l/r elbow,
# l/r wrist, l/r hip, l/r knee, l/r ankle.
COCO_JOINT_COLORS = np.array(
    [
        (255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255),
        (255, 255, 0), (255, 0, 255), (0, 255, 255), (255, 128, 0),
        (128, 0, 255), (0, 128, 255), (128, 255, 0), (255, 0, 128),
        (0, 255, 128), (128, 128, 255), (255, 128, 128), (128, 64, 0),
        (64, 128, 64),
    ],
    np.uint8,
)

_COCO_EDGES = COCO_SKELETON  # 19 edges, 0-based (models.recursive)


def synthetic_coco_person_pose(rng: np.random.Generator,
                               img_size: int) -> np.ndarray:
    """One plausible articulated COCO pose: (17, 3) [x, y, visible>0]."""

    def unit(deg):
        r = np.deg2rad(deg)
        return np.array([np.cos(r), np.sin(r)])

    s = rng.uniform(0.16, 0.26) * img_size
    pelvis = rng.uniform(0.35, 0.65, 2) * img_size
    torso_deg = rng.normal(-90, 12)
    d = unit(torso_deg)
    perp = np.array([-d[1], d[0]])

    kps = np.zeros((17, 3), np.float32)
    thorax = pelvis + s * d
    head = thorax + 0.45 * s * unit(torso_deg + rng.normal(0, 10))
    kps[0, :2] = head                                   # nose
    eye = 0.10 * s
    kps[1, :2] = head - perp * eye - 0.06 * s * d       # l eye
    kps[2, :2] = head + perp * eye - 0.06 * s * d       # r eye
    kps[3, :2] = head - perp * 2 * eye                  # l ear
    kps[4, :2] = head + perp * 2 * eye                  # r ear
    sho = 0.26 * s
    kps[5, :2] = thorax - perp * sho                    # l shoulder
    kps[6, :2] = thorax + perp * sho                    # r shoulder
    hip = 0.17 * s
    kps[11, :2] = pelvis - perp * hip                   # l hip
    kps[12, :2] = pelvis + perp * hip                   # r hip
    for shoj, elb, wri in ((5, 7, 9), (6, 8, 10)):
        a1 = 90 + rng.normal(0, 65)
        kps[elb, :2] = kps[shoj, :2] + 0.38 * s * unit(a1)
        kps[wri, :2] = kps[elb, :2] + 0.36 * s * unit(a1 + rng.normal(0, 45))
    for hipj, knee, ank in ((11, 13, 15), (12, 14, 16)):
        a1 = 90 + rng.normal(0, 22)
        kps[knee, :2] = kps[hipj, :2] + 0.52 * s * unit(a1)
        kps[ank, :2] = kps[knee, :2] + 0.48 * s * unit(a1 + rng.normal(0, 30))

    kps[:, :2] = np.clip(kps[:, :2], 3, img_size - 4)
    kps[:, 2] = (rng.random(17) > 0.05).astype(np.float32) * 2.0
    return kps


def stickfigure_coco_image(kps: np.ndarray, polys: np.ndarray,
                           n_verts: np.ndarray, n_persons: int,
                           img_size: int, seed: int = 0) -> np.ndarray:
    """Render COCO stick-figures: silhouette polygons filled dim (signal for
    the background stage), skeleton limbs, color-coded joint disks."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    bg = (rng.random((img_size, img_size, 3)) * 40).astype(np.uint8)
    pil = Image.fromarray(bg)
    draw = ImageDraw.Draw(pil)
    lw = max(2, round(0.012 * img_size))
    rj = max(2.5, 0.012 * img_size)
    for p in range(int(n_persons)):
        nv = int(n_verts[p])
        if nv >= 3:
            draw.polygon([tuple(v) for v in polys[p, :nv].tolist()],
                         fill=(70, 70, 70))
    for p in range(int(n_persons)):
        person = kps[p]
        for a, b in _COCO_EDGES:
            if person[a, 2] > 0 and person[b, 2] > 0:
                color = tuple(
                    int(c) for c in (
                        0.45 * (COCO_JOINT_COLORS[a].astype(np.float32)
                                + COCO_JOINT_COLORS[b].astype(np.float32)) / 2
                    )
                )
                draw.line([tuple(person[a, :2].tolist()),
                           tuple(person[b, :2].tolist())],
                          fill=color, width=lw)
        for j in range(17):
            if person[j, 2] > 0:
                x, y = float(person[j, 0]), float(person[j, 1])
                draw.ellipse([x - rj, y - rj, x + rj, y + rj],
                             fill=tuple(int(c) for c in COCO_JOINT_COLORS[j]))
    return np.asarray(pil, np.float32) / 255.0


def synthetic_stickfigure_coco_manifest(
    n_images: int = 64, img_size: int = 256, seed: int = 0,
    max_persons: int = 2, max_vertices: int = 16,
) -> Manifest:
    """COCO-schema manifest over stick-figure persons (1..max_persons per
    image) with silhouette polygons. ``synthfigc_`` names make HostLoader
    render them with stickfigure_coco_image."""
    rng = np.random.default_rng(seed)
    kps = np.zeros((n_images, max_persons, N_JOINTS_COCO, 3), np.float32)
    polys = np.zeros((n_images, max_persons, max_vertices, 2), np.float32)
    n_verts = np.zeros((n_images, max_persons), np.int32)
    n_persons = rng.integers(1, max_persons + 1, (n_images,)).astype(np.int32)
    for i in range(n_images):
        for p in range(n_persons[i]):
            kps[i, p] = synthetic_coco_person_pose(rng, img_size)
            vis = kps[i, p, :, 2] > 0
            pts = kps[i, p, vis, :2]
            cx, cy = pts.mean(0)
            rad = max(float(np.max(np.linalg.norm(pts - (cx, cy), axis=1)))
                      * 1.15, 8.0)
            ang = np.linspace(0, 2 * np.pi, max_vertices, endpoint=False)
            polys[i, p, :, 0] = np.clip(cx + rad * np.cos(ang), 0,
                                        img_size - 1)
            polys[i, p, :, 1] = np.clip(cy + rad * np.sin(ang), 0,
                                        img_size - 1)
            n_verts[i, p] = max_vertices
    return {
        "image_names": np.asarray(
            [f"synthfigc_{seed}_{img_size}_{i:06d}" for i in range(n_images)]
        ),
        "image_dims": np.full((n_images, 2), img_size, np.int32),
        "keypoints": kps,
        "polygons": polys,
        "n_vertices": n_verts,
        "n_persons": n_persons,
        "skeleton": COCO_SKELETON,
        "truncation_counts": np.zeros(2, np.int64),
    }


def synthetic_stickfigure_manifest(
    n_images: int = 64, img_size: int = 256, seed: int = 0
) -> Manifest:
    """MPII-schema manifest over stick-figure persons. Image names carry the
    ``synthfig_`` prefix so HostLoader renders them with stickfigure_image
    (deterministic per index) instead of reading files."""
    rng = np.random.default_rng(seed)
    kps = np.zeros((n_images, N_JOINTS_MPII, 3), np.float32)
    rects = np.zeros((n_images, 4), np.float32)
    for i in range(n_images):
        kps[i] = synthetic_person_pose(rng, img_size)
        rects[i] = stickfigure_head_rect(kps[i])
    return {
        "image_names": np.asarray(
            [f"synthfig_{seed}_{img_size}_{i:06d}" for i in range(n_images)]
        ),
        "image_dims": np.full((n_images, 2), img_size, np.int32),
        "keypoints": kps,
        "head_rects": rects,
        "release_indices": np.arange(n_images, dtype=np.int64),
    }
