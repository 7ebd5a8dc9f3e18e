"""Offline manifest builders: raw annotations → packed, static-shape arrays.

The reference reads annotations lazily inside Dataset.__getitem__ (pycocotools
queries, scipy .mat struct walks — /root/reference/train.py:204-340, 625-736).
XLA needs static shapes, so here all parsing happens ONCE offline (host), and
the result is a dict of padded numpy arrays ("manifest") that the device
pipeline can consume directly. pycocotools' C extension is replaced by a
pure-Python JSON indexer (SURVEY.md §2.3).

Builders + their reference counterparts:

- :func:`build_lsp_manifest` — LSP joints.mat, 14 joints
  (/root/reference/data_argumentation.py:10-52); split via
  :func:`lsp_split` (shuffle, i%10==0 → eval,
  /root/reference/make_train_eval_set.py:7-20).
- :func:`build_mpii_manifest` — MPII RELEASE struct: keep single-person
  images with annopoints (/root/reference/make_train_eval_test_mpii.py:74-96),
  extract 16 joints + visibility + head rect
  (/root/reference/train.py:649-694); split i%10<1 → test, <3 → eval,
  else train (make_train_eval_test_mpii.py:100-107).
- :func:`build_coco_manifest` — COCO person_keypoints JSON: per-image packed
  keypoints (17 per person) + first segmentation polygon per annotation
  (/root/reference/train.py:227-246 keeps ``segmentation[0]`` and skips
  annotations without it).

Manifests are dicts of numpy arrays; :func:`save_manifest` /
:func:`load_manifest` round-trip them as .npz.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

Manifest = Dict[str, np.ndarray]

N_JOINTS_LSP = 14
N_JOINTS_MPII = 16
N_JOINTS_COCO = 17


def save_manifest(path: str, manifest: Manifest) -> None:
    np.savez_compressed(path, **manifest)


def load_manifest(path: str) -> Manifest:
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


# --------------------------------------------------------------------------
# LSP
# --------------------------------------------------------------------------

def build_lsp_manifest(joints_mat_path: str) -> Manifest:
    """LSP: joints.mat holds (3, 14, N) [x; y; visibility-flag] and images
    are im0001.jpg..imNNNN.jpg (/root/reference/data_argumentation.py:14-50,
    which indexes joints[axis][joint][number])."""
    import scipy.io

    mat = scipy.io.loadmat(joints_mat_path)
    joints = np.asarray(mat["joints"])  # (3, 14, N)
    n = joints.shape[2]
    coords = np.transpose(joints, (2, 1, 0)).astype(np.float32)  # (N, 14, 3)
    names = np.asarray([f"im{i + 1:04d}.jpg" for i in range(n)])
    return {"image_names": names, "keypoints": coords}


def lsp_split(n: int, seed: int = 0):
    """Shuffled i%10==0 eval split (make_train_eval_set.py:7-20)."""
    order = np.random.default_rng(seed).permutation(n)
    is_eval = np.arange(n) % 10 == 0
    train = order[~is_eval]
    eval_ = order[is_eval]
    return np.sort(train), np.sort(eval_)


# --------------------------------------------------------------------------
# MPII
# --------------------------------------------------------------------------

def build_mpii_manifest(release_mat_path: str) -> Manifest:
    """Parse the MPII RELEASE struct; keep training images with exactly one
    annotated person (scalar annorect with annopoints —
    make_train_eval_test_mpii.py:74-96)."""
    import scipy.io

    T = scipy.io.loadmat(release_mat_path, squeeze_me=True, struct_as_record=False)
    release = T["RELEASE"]
    annolist = release.annolist
    img_train = np.atleast_1d(release.img_train)

    names, points, rects, indices = [], [], [], []
    for i, anno in enumerate(np.atleast_1d(annolist)):
        if not img_train[i]:
            continue
        rect = getattr(anno, "annorect", None)
        if rect is None or isinstance(rect, np.ndarray):
            continue  # zero or multiple persons
        pts = getattr(rect, "annopoints", None)
        if pts is None or isinstance(pts, np.ndarray) and pts.size == 0:
            continue
        point_list = getattr(pts, "point", None)
        if point_list is None:
            continue
        kp = np.zeros((N_JOINTS_MPII, 3), np.float32)
        for p in np.atleast_1d(point_list):
            vis = getattr(p, "is_visible", 1)
            # reference: is_visible == 0 -> 0, anything else (incl. empty) -> 1
            # (/root/reference/train.py:662-666)
            visible = 0.0 if (np.size(vis) == 1 and vis == 0) else 1.0
            kp[int(p.id)] = [float(p.x), float(p.y), visible]
        try:
            head = [float(rect.x1), float(rect.y1), float(rect.x2), float(rect.y2)]
        except AttributeError:
            continue
        names.append(str(anno.image.name))
        points.append(kp)
        rects.append(head)
        indices.append(i)

    return {
        "image_names": np.asarray(names),
        "keypoints": np.stack(points) if points else np.zeros((0, N_JOINTS_MPII, 3), np.float32),
        "head_rects": np.asarray(rects, np.float32).reshape(-1, 4),
        "release_indices": np.asarray(indices, np.int64),
    }


def mpii_split(n: int):
    """i%10 < 1 → test, < 3 → eval, else train
    (make_train_eval_test_mpii.py:100-107)."""
    r = np.arange(n) % 10
    return np.nonzero(r >= 3)[0], np.nonzero((r >= 1) & (r < 3))[0], np.nonzero(r < 1)[0]


# Manifest keys that are NOT per-sample rows (never sliced by a split).
_GLOBAL_KEYS = frozenset({"skeleton", "truncation_counts"})


def manifest_kind(manifest: Manifest) -> str:
    """Classify a manifest by schema: 'coco' (packed polygons + multi-person
    keypoints), 'mpii' (single person + head rects), or 'lsp' (single person,
    14 joints, Gaussian-target path)."""
    if "polygons" in manifest:
        return "coco"
    if "head_rects" in manifest:
        return "mpii"
    return "lsp"


def apply_split(manifest: Manifest, indices: np.ndarray) -> Manifest:
    """Slice every per-sample array of a manifest down to ``indices``;
    global arrays (skeleton, truncation counts) pass through unchanged."""
    n = len(manifest["image_names"])
    out = {}
    for k, v in manifest.items():
        if k not in _GLOBAL_KEYS and np.ndim(v) >= 1 and len(v) == n:
            out[k] = v[indices]
        else:
            out[k] = v
    return out


def select_split(manifest: Manifest, split: Optional[str], seed: int = 0) -> Manifest:
    """Apply the reference's named split to a manifest.

    MPII: deterministic i%10 buckets over the kept single-person samples
    (make_train_eval_test_mpii.py:100-107 — i is the kept-sample counter,
    exactly the manifest row index here). LSP: shuffled i%10==0 → eval
    (make_train_eval_set.py:7-20). COCO has no in-file split — the reference
    uses separate train/val JSON files, so requesting one is an error.
    """
    if split in (None, "all"):
        return manifest
    kind = manifest_kind(manifest)
    n = len(manifest["image_names"])
    if kind == "mpii":
        train, eval_, test = mpii_split(n)
        table = {"train": train, "eval": eval_, "test": test}
    elif kind == "lsp":
        train, eval_ = lsp_split(n, seed)
        table = {"train": train, "eval": eval_}
    else:
        raise ValueError(
            "COCO manifests carry no split — build one per JSON file "
            "(train/val), as the reference does (/root/reference/train.py:66-74)"
        )
    if split not in table:
        raise ValueError(f"unknown split {split!r} for {kind}; have {sorted(table)}")
    return apply_split(manifest, table[split])


# --------------------------------------------------------------------------
# COCO (pure-python JSON indexer — replaces pycocotools)
# --------------------------------------------------------------------------

def build_coco_manifest(
    json_path: str,
    max_persons: int = 13,
    max_vertices: int = 128,
    strict: bool = False,
) -> Manifest:
    """person_keypoints_*.json → per-image packed arrays.

    Mirrors the reference's annotation handling (train.py:227-246): for each
    annotation keep the FIRST segmentation polygon (``segmentation[0]``) and
    the 17 keypoints; annotations without a polygon list (e.g. RLE crowds)
    are skipped via the same KeyError/try semantics.

    The reference rasterizes EVERY annotation of an image (train.py:282-324);
    XLA needs static shapes, so persons beyond ``max_persons`` and vertices
    beyond ``max_vertices`` are truncated here. To guarantee no silent label
    divergence on crowded images: pass ``strict=True`` to error instead of
    truncating (the error names the actual maxima so the caps can be raised
    to cover the dataset exactly), or raise the caps (CLI:
    ``--max-persons/--max-vertices/--strict-manifest``). Truncation counts
    are always recorded in ``truncation_counts``.
    """
    with open(json_path) as f:
        coco = json.load(f)

    images = {im["id"]: im for im in coco["images"]}
    by_image: Dict[int, list] = {}
    for ann in coco["annotations"]:
        seg = ann.get("segmentation")
        if not isinstance(seg, list) or not seg or not isinstance(seg[0], list):
            continue  # reference's try/except KeyError path
        if "keypoints" not in ann:
            continue
        by_image.setdefault(ann["image_id"], []).append(ann)

    img_ids = sorted(by_image)
    if strict:
        need_p = max((len(a) for a in by_image.values()), default=0)
        need_v = 0
        for anns in by_image.values():
            for ann in anns:
                need_v = max(need_v, len(ann["segmentation"][0]) // 2)
        if need_p > max_persons or need_v > max_vertices:
            raise ValueError(
                f"strict manifest build: dataset needs max_persons >= "
                f"{need_p} and max_vertices >= {need_v} to rasterize every "
                f"annotation like the reference (train.py:282-324); got "
                f"max_persons={max_persons}, max_vertices={max_vertices}. "
                f"Raise the caps or drop --strict-manifest to truncate.")
    n = len(img_ids)
    names = []
    dims = np.zeros((n, 2), np.int32)  # (h, w)
    kps = np.zeros((n, max_persons, N_JOINTS_COCO, 3), np.float32)
    polys = np.zeros((n, max_persons, max_vertices, 2), np.float32)
    n_verts = np.zeros((n, max_persons), np.int32)
    n_persons = np.zeros((n,), np.int32)
    truncated_persons = 0
    truncated_verts = 0

    for row, img_id in enumerate(img_ids):
        im = images[img_id]
        names.append(im["file_name"])
        dims[row] = (im["height"], im["width"])
        anns = by_image[img_id]
        if len(anns) > max_persons:
            truncated_persons += len(anns) - max_persons
            anns = anns[:max_persons]
        n_persons[row] = len(anns)
        for p, ann in enumerate(anns):
            kps[row, p] = np.asarray(ann["keypoints"], np.float32).reshape(
                N_JOINTS_COCO, 3
            )
            seg = np.asarray(ann["segmentation"][0], np.float32).reshape(-1, 2)
            if len(seg) > max_vertices:
                truncated_verts += len(seg) - max_vertices
                seg = seg[:max_vertices]
            polys[row, p, : len(seg)] = seg
            n_verts[row, p] = len(seg)

    skeleton = None
    for cat in coco.get("categories", []):
        if cat.get("name") == "person" and "skeleton" in cat:
            skeleton = np.asarray(cat["skeleton"], np.int32) - 1  # 0-based
    if skeleton is None:
        from ..models.recursive import COCO_SKELETON

        skeleton = COCO_SKELETON

    return {
        "image_names": np.asarray(names),
        "image_dims": dims,
        "keypoints": kps,
        "polygons": polys,
        "n_vertices": n_verts,
        "n_persons": n_persons,
        "skeleton": skeleton,
        "truncation_counts": np.asarray([truncated_persons, truncated_verts]),
    }
