"""Dataset validation CLI — the reference's only integration test,
``dataset_check.py``, streams the whole COCO loader once to flush crashing
or degenerate samples (/root/reference/dataset_check.py:108-118). This does
the same for any manifest, through the full device renderer, and reports:

- decode failures (missing/corrupt image files) per sample;
- samples whose rendered keypoint label map is empty (no visible joint
  landed in the /4 map — the silent kind of degeneracy the reference's
  visual checks were hunting);
- non-finite pixels after rendering;
- manifest truncation counts (persons/vertices dropped at build time).

Exit status is non-zero when any failure is found.
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from .common import add_data_args, build_loader_from_args, resolve_experiment


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--max-report", type=int, default=20,
                   help="cap on per-sample failure lines printed")
    args = p.parse_args(argv)
    resolve_experiment(args)
    return args


def validate_manifest(manifest, loader, render_fn, max_report: int = 20):
    """Stream every sample; returns a report dict (also printed)."""
    n = len(manifest["image_names"])
    failures = []  # (index, reason)
    n_empty = 0
    n_nonfinite = 0
    seen = 0

    # Per-sample decode so one bad file doesn't kill the batch.
    for idx in range(n):
        try:
            loaded = loader._load_image(idx)
        except Exception as e:  # noqa: BLE001 — report, don't crash
            failures.append((idx, f"decode failed: {e}"))
            continue
        batch = loader._pack_batch(np.asarray([idx]), [loaded])
        out = render_fn(jax.random.PRNGKey(0), batch)
        seen += 1
        img = np.asarray(out["image"], np.float32)
        if not np.isfinite(img).all():
            n_nonfinite += 1
            failures.append((idx, "non-finite pixels after rendering"))
        if "keypoint_map" in out:
            if int(np.asarray(out["keypoint_map"]).max()) == 0:
                n_empty += 1
                failures.append((idx, "empty keypoint label map"))
        elif "gauss_maps" in out:
            if float(np.asarray(out["gauss_maps"]).max()) <= 0:
                n_empty += 1
                failures.append((idx, "all-zero Gaussian targets"))

    trunc = manifest.get("truncation_counts")
    report = {
        "samples": n,
        "rendered": seen,
        "failures": len(failures),
        "empty_labels": n_empty,
        "nonfinite": n_nonfinite,
        "truncated_persons": int(trunc[0]) if trunc is not None else 0,
        "truncated_vertices": int(trunc[1]) if trunc is not None else 0,
        "failure_list": failures,
    }

    print(f"validated {seen}/{n} samples")
    if trunc is not None and (report["truncated_persons"] or report["truncated_vertices"]):
        print(f"manifest truncation: {report['truncated_persons']} persons, "
              f"{report['truncated_vertices']} vertices dropped at build time")
    for idx, reason in failures[:max_report]:
        name = str(manifest["image_names"][idx])
        print(f"  sample {idx} ({name}): {reason}")
    if len(failures) > max_report:
        print(f"  ... and {len(failures) - max_report} more")
    print("OK" if not failures else f"{len(failures)} failing samples")
    return report


def main(argv=None):
    args = parse_args(argv)
    from progressive_process_for_human_pose_estimation_tpu.data import make_render_fn

    manifest, loader = build_loader_from_args(args, shuffle=False,
                                              drop_remainder=False)
    render_fn = make_render_fn(manifest, inputsize=args.input_size,
                               augment=False, render_gauss=True)
    loader.staging_size = render_fn.staging_size
    report = validate_manifest(manifest, loader, render_fn, args.max_report)
    if report["failures"]:
        sys.exit(1)
    return report


if __name__ == "__main__":
    main()
