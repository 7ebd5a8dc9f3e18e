"""On-device PCKh evaluation — all three reference variants, fully vectorized.

The reference computes PCKh in a per-image per-joint Python loop on CPU
(SURVEY.md §3.2 calls it out as a host hot loop); here the whole metric is a
jit-compatible array program so train and eval stay end-to-end XLA.

Variants:

- :func:`pckh_curve` — the canonical 11-threshold detection-rate curve
  (/root/reference/train.py:759-791 and
  /root/reference/performance_compare.py:544-578): ground truth is the first
  (row-major) pixel of the integer class map equal to j+1; the prediction is
  the first argmax pixel of softmaxed channel j+1 (background at channel 0);
  distances are normalized by 0.6 x the MPII head-rect diagonal; thresholds
  are 0, 0.05, ..., 0.5; joints absent from the label map are skipped.
- :func:`pckh_curve` with ``background_offset=False`` — the baseline-model
  variant that reads channel j instead of j+1
  (/root/reference/performance_compare.py:581-615).
- :func:`pckh_simple` — the early heatmap-based scalar accuracy with
  standard = head-neck distance / 2
  (/root/reference/only_one_hourgless.py:285-313). The reference
  implementation has two copy-paste indexing bugs (it derives both x
  coordinates from the *label* heatmap row at the head's y); the default
  here is the corrected semantics, ``bug_compat=True`` reproduces the
  reference bit-for-bit (SURVEY.md §7 keep-or-fix list).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# np.arange(0, 0.55, 0.05) — 11 thresholds (train.py:782). Kept as numpy:
# a jnp array at module scope would initialize the XLA backend at import
# time, breaking jax.distributed.initialize() in multi-host CLI runs.
PCKH_THRESHOLDS = np.arange(11, dtype=np.float32) * np.float32(0.05)


class PCKhResult(NamedTuple):
    accuracy: jax.Array  # (N, 11) per-image detection-rate curve
    predictions: jax.Array  # (N, J, 2) predicted (x, y); 0 where joint absent
    labels: jax.Array  # (N, J, 2) ground-truth (x, y); 0 where joint absent
    standard: jax.Array  # (N,) normalization distance


def _flat_argmax_yx(m: jax.Array):
    """Row-major first argmax position of an (H, W) map. For a bool mask
    this is the first True (torch.nonzero(mask)[0]); for a float map the
    first maximum (torch.nonzero(x >= x.max())[0])."""
    w = m.shape[1]
    flat_idx = jnp.argmax(m.reshape(-1))
    return flat_idx // w, flat_idx % w


def _argmax_rowcol(m: jax.Array):
    """The reference's row/column two-step argmax
    (only_one_hourgless.py:291-299): ys = argmax over rows of per-row
    maxima; xs = argmax within row ys. Differs from _flat_argmax_yx only in
    tie-breaking."""
    ys = jnp.argmax(jnp.max(m, axis=1))
    xs = jnp.argmax(m[ys])
    return ys, xs


def pckh_curve(
    heatmaps: jax.Array,
    target: jax.Array,
    rect: jax.Array,
    background_offset: bool = True,
) -> PCKhResult:
    """PCKh detection-rate curve (/root/reference/train.py:763-791).

    Args:
      heatmaps: (N, H, W, C) softmaxed model output (NHWC). With
        ``background_offset`` the joint-j prediction reads channel j+1 and
        C-1 joints are evaluated; otherwise channel j and C joints.
      target: (N, Ht, Wt) integer class map; joint j occupies value j+1.
      rect: (N, 4) MPII head rectangle (x1, y1, x2, y2), already scaled to
        target-map pixels.
    """
    n, h, w, c = heatmaps.shape
    n_joints = c - 1 if background_offset else c
    offset = 1 if background_offset else 0

    standard = (
        jnp.sqrt(
            jnp.square(rect[:, 0] - rect[:, 2]) + jnp.square(rect[:, 1] - rect[:, 3])
        ).astype(jnp.float32)
        * 0.6
    )  # (N,)

    def per_image(hm, tgt):
        def per_joint(j):
            mask = tgt == (j + 1)
            present = jnp.any(mask)
            ly, lx = _flat_argmax_yx(mask)
            py, px = _flat_argmax_yx(hm[:, :, j + offset])
            dist = jnp.sqrt(
                jnp.square(ly - py).astype(jnp.float32)
                + jnp.square(lx - px).astype(jnp.float32)
            )
            return present, dist, jnp.stack([px, py]), jnp.stack([lx, ly])

        present, dist, pred, label = jax.vmap(per_joint)(jnp.arange(n_joints))
        return present, dist, pred, label

    present, dist, preds, labels = jax.vmap(per_image)(heatmaps, target)
    # (N, J) / (N, J) / (N, J, 2)

    norm_dist = dist / standard[:, None]  # (N, J)
    # correct[step] counts distance < threshold among present joints;
    # total is the number of present joints (same for all thresholds).
    hits = (norm_dist[:, :, None] < PCKH_THRESHOLDS[None, None, :]) & present[:, :, None]
    correct = jnp.sum(hits, axis=1).astype(jnp.float32)  # (N, 11)
    total = jnp.sum(present, axis=1).astype(jnp.float32)[:, None]  # (N, 1)
    accuracy = correct / total  # NaN when no joints present, as in reference

    zero = jnp.zeros_like(preds)
    preds = jnp.where(present[:, :, None], preds, zero)
    labels = jnp.where(present[:, :, None], labels, zero)
    return PCKhResult(accuracy, preds, labels, standard)


def pckh_gauss_curve(
    heatmaps: jax.Array,
    target_heatmaps: jax.Array,
    head_index: int = 13,
    neck_index: int = 1,
    n_joints: int = 14,
) -> jax.Array:
    """Per-image PCKh detection-rate curve for Gaussian-target schemas (LSP).

    Same geometry as :func:`pckh_simple` — GT/prediction located by
    row/column argmax of the Gaussian target / predicted heatmap, standard =
    head-neck distance (/root/reference/only_one_hourgless.py:285-313, whose
    fixed ``dist < standard/2`` test equals this curve read at t=0.5) — but
    swept over the 11 canonical thresholds so the LSP path reports a real
    measured curve instead of one scalar.

    Returns (N, 11) per-image accuracies (NaN where no joints are present).
    """

    def per_image(hm, tgt):
        head_y, head_x = _argmax_rowcol(tgt[:, :, head_index])
        neck_y, neck_x = _argmax_rowcol(tgt[:, :, neck_index])
        standard = jnp.sqrt(
            jnp.square(head_y - neck_y).astype(jnp.float32)
            + jnp.square(head_x - neck_x).astype(jnp.float32)
        )

        def per_joint(j):
            label_map = tgt[:, :, j]
            present = jnp.max(label_map) > 0
            ly, lx = _argmax_rowcol(label_map)
            py, px = _argmax_rowcol(hm[:, :, j])
            dist = jnp.sqrt(
                jnp.square(ly - py).astype(jnp.float32)
                + jnp.square(lx - px).astype(jnp.float32)
            )
            return present, dist

        present, dist = jax.vmap(per_joint)(jnp.arange(n_joints))
        norm = dist / jnp.maximum(standard, 1e-6)
        hits = (norm[:, None] < PCKH_THRESHOLDS[None, :]) & present[:, None]
        correct = jnp.sum(hits, axis=0).astype(jnp.float32)  # (11,)
        total = jnp.sum(present).astype(jnp.float32)
        return correct / total  # NaN when no joints present, as pckh_curve

    return jax.vmap(per_image)(heatmaps, target_heatmaps)


def pckh_simple(
    heatmaps: jax.Array,
    target_heatmaps: jax.Array,
    head_index: int = 13,
    neck_index: int = 1,
    n_joints: int = 14,
    bug_compat: bool = True,
) -> jax.Array:
    """Scalar PCKh@head-neck/2 (/root/reference/only_one_hourgless.py:285-313).

    Args:
      heatmaps: (N, H, W, C) predicted heatmaps (NHWC).
      target_heatmaps: (N, H, W, C) ground-truth Gaussian heatmaps.
      bug_compat: reproduce the reference's copy-paste indexing (both x
        coordinates read from the label map's row at the head's y;
        only_one_hourgless.py:305-308). Default True — the repo-wide
        convention is bit-faithful by default with the corrected form behind
        the flag (same as ``always_project``, the polygon corner rule, and
        hflip-without-relabel); pass ``bug_compat=False`` for the corrected
        argmax metric (what :func:`pckh_gauss_curve` reports at t=0.5).
    Returns:
      scalar accuracy = correct / total over the batch.
    """

    def per_image(hm, tgt):
        head_y, head_x = _argmax_rowcol(tgt[:, :, head_index])
        neck_y, neck_x = _argmax_rowcol(tgt[:, :, neck_index])
        standard = (
            jnp.sqrt(
                jnp.square(head_y - neck_y).astype(jnp.float32)
                + jnp.square(head_x - neck_x).astype(jnp.float32)
            )
            / 2.0
        )

        def per_joint(j):
            label_map = tgt[:, :, j]
            present = jnp.max(label_map) > 0
            ly = jnp.argmax(jnp.max(label_map, axis=1))
            py = jnp.argmax(jnp.max(heatmaps_j(j), axis=1))
            if bug_compat:
                # reference: label_xs/predict_xs both from label map at head_y
                lx = jnp.argmax(label_map[head_y])
                px = jnp.argmax(label_map[head_y])
            else:
                lx = jnp.argmax(label_map[ly])
                px = jnp.argmax(heatmaps_j(j)[py])
            dist = jnp.sqrt(
                jnp.square(ly - py).astype(jnp.float32)
                + jnp.square(lx - px).astype(jnp.float32)
            )
            return present, (dist < standard) & present

        def heatmaps_j(j):
            return hm[:, :, j]

        present, correct = jax.vmap(per_joint)(jnp.arange(n_joints))
        return jnp.sum(correct), jnp.sum(present)

    correct, total = jax.vmap(per_image)(heatmaps, target_heatmaps)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(total), 1)
