"""Shared CLI plumbing: model/data construction from flags."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--preset", default="progressive_mpii",
                   help="model preset name (see models.PRESETS)")
    p.add_argument("--features", type=int, default=None)
    p.add_argument("--hourglass-depth", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])


def build_model_from_args(args, **extra):
    from progressive_process_for_human_pose_estimation_tpu.models import build_model

    kw = dict(dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    if args.features is not None:
        kw["features"] = args.features
    if getattr(args, "hourglass_depth", None) is not None:
        kw["hourglass_depth"] = args.hourglass_depth
    kw.update(extra)
    return build_model(args.preset, **kw)


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "coco", "mpii"])
    p.add_argument("--manifest", default=None, help="path to a saved .npz manifest")
    p.add_argument("--image-dir", default=None)
    p.add_argument("--coco-json", default=None)
    p.add_argument("--mpii-mat", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-synthetic", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)


def build_loader_from_args(args, shuffle=True):
    from progressive_process_for_human_pose_estimation_tpu.data import (
        HostLoader,
        build_coco_manifest,
        load_manifest,
        synthetic_coco_manifest,
    )

    if args.manifest:
        manifest = load_manifest(args.manifest)
    elif args.dataset == "coco":
        if not args.coco_json:
            raise SystemExit("--coco-json or --manifest required for dataset=coco")
        manifest = build_coco_manifest(args.coco_json)
    elif args.dataset == "mpii":
        from progressive_process_for_human_pose_estimation_tpu.data import (
            build_mpii_manifest,
        )

        if not args.mpii_mat:
            raise SystemExit("--mpii-mat or --manifest required for dataset=mpii")
        manifest = build_mpii_manifest(args.mpii_mat)
    else:
        manifest = synthetic_coco_manifest(n_images=args.n_synthetic, seed=args.seed)

    loader = HostLoader(
        manifest,
        image_dir=args.image_dir,
        batch_size=args.batch_size,
        seed=args.seed,
        shuffle=shuffle,
    )
    return manifest, loader
