"""Shared CLI plumbing: experiment-config resolution + model/data construction.

The reference configures runs by hand-editing module constants per script
(/root/reference/train.py:39-97); here ``--experiment <name>`` resolves a
:class:`~progressive_process_for_human_pose_estimation_tpu.config.ExperimentConfig`
preset and any flag the user passes explicitly overrides it (flags default to
None so "not given" is detectable).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--preset", default=None,
                   help="model preset name (see models.PRESETS); default "
                        "progressive_mpii or the --experiment's model")
    p.add_argument("--features", type=int, default=None)
    p.add_argument("--hourglass-depth", type=int, default=None)
    p.add_argument("--out-channels", default=None,
                   help="override head channels: one int, or comma-separated "
                        "ints for multi-stage presets (e.g. 14 for LSP)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize hourglass activations in the backward "
                        "pass (less HBM, ~1 extra stack forward of FLOPs). "
                        "Helps deep stacks (8-stack: +27%% measured), hurts "
                        "the shallow progressive family (-13%%) — see "
                        "ROUND2_NOTES 'Training step'")
    p.add_argument("--remat-policy", default=None,
                   choices=["dots", "dots_no_batch"],
                   help="jax.checkpoint policy for --remat; 'dots' (keep MXU "
                        "outputs) measured fastest for the 8-stack "
                        "(281.5 vs 262.5 img/s plain — ROUND3_NOTES)")
    p.add_argument("--scan-stacks", action="store_true",
                   help="compile the weight-shared stacks as ONE lax.scan "
                        "iteration instead of unrolling (StackedHourglass "
                        "presets only; param tree unchanged, ~8x less "
                        "compiled code — see ROUND3_NOTES)")


def add_eval_bn_arg(p: argparse.ArgumentParser):
    p.add_argument("--eval-bn", default=None, choices=["batch", "running"],
                   help="test-time BatchNorm mode: 'batch' = current-batch "
                        "statistics (the try_* scripts never call .eval(); "
                        "required for their weight-shared-BN models), "
                        "'running' = EMA averages (.eval(), train.py:991). "
                        "Default: the --experiment's recorded behavior, else "
                        "'running'")


def make_eval_apply(model, batch_mode: bool):
    """Forward function for evaluation honoring the BN mode — thin alias of
    :func:`...train.make_eval_apply` (see its docstring for the running-vs-
    batch-statistics provenance)."""
    from progressive_process_for_human_pose_estimation_tpu.train import (
        make_eval_apply as _make,
    )

    return _make(model, batch_mode)


def build_eval_model_from_args(args, fold: bool = False, **extra):
    """Eval-side model construction honoring the resolved test-time BN mode
    (``args.eval_bn``, see :func:`resolve_experiment`) and the fold/BN
    constraint. Returns ``(model, apply_fn, batch_bn)`` where ``apply_fn``
    is :func:`make_eval_apply`'s ``(variables, x) -> outputs-list``."""
    batch_bn = getattr(args, "eval_bn", None) == "batch"
    if fold and batch_bn:
        raise SystemExit(
            "--fold folds the running BN statistics into the tail matmul and "
            "cannot run with batch statistics; pass --eval-bn running (note "
            "the try_*-derived experiments record batch-stat eval as their "
            "faithful mode)")
    if fold:
        extra["fold_tail"] = True
    model = build_model_from_args(args, use_running_average=not batch_bn, **extra)
    return model, make_eval_apply(model, batch_bn), batch_bn


def infer_preset_experiment(preset):
    """(eval_batch_stats, objective) agreed by every EXPERIMENTS entry built
    on this model preset — (None, None)-ish when no entry or no agreement.
    Lets preset-only eval invocations (no --experiment) recover the faithful
    test-time BN mode and scoring objective instead of silently defaulting
    to the .eval()/progressive pair (which scores e.g. a trained
    hourglass8_skeleton checkpoint at 0% PCKh)."""
    from progressive_process_for_human_pose_estimation_tpu.config import (
        EXPERIMENTS,
    )

    matches = [c for c in EXPERIMENTS.values() if c.model_preset == preset]
    if not matches:
        return None, None
    ebs = {c.eval_batch_stats for c in matches}
    objs = {c.objective for c in matches}
    return (ebs.pop() if len(ebs) == 1 else None,
            objs.pop() if len(objs) == 1 else None)


def build_model_from_args(args, **extra):
    from progressive_process_for_human_pose_estimation_tpu.models import build_model
    from progressive_process_for_human_pose_estimation_tpu.utils.precision import (
        DEFAULT_POLICY,
        PARITY_POLICY,
    )

    # --dtype selects the precision Policy (bf16 compute / fp32 params =
    # apex-O1 analogue; full fp32 = the parity policy used by the tests).
    policy = DEFAULT_POLICY if args.dtype == "bfloat16" else PARITY_POLICY
    kw = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    if args.features is not None:
        kw["features"] = args.features
    if getattr(args, "hourglass_depth", None) is not None:
        kw["hourglass_depth"] = args.hourglass_depth
    if getattr(args, "out_channels", None) is not None:
        chans = [int(c) for c in str(args.out_channels).split(",")]
        kw["out_channels"] = chans[0] if len(chans) == 1 else tuple(chans)
    if getattr(args, "remat", False):
        kw["remat"] = True
        if getattr(args, "remat_policy", None):
            kw["remat_policy"] = args.remat_policy
    if getattr(args, "scan_stacks", False):
        kw["scan_stacks"] = True
    kw.update(extra)
    return build_model(args.preset, **kw)


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default=None,
                   choices=["synthetic", "coco", "mpii", "lsp"])
    p.add_argument("--manifest", default=None, help="path to a saved .npz manifest")
    p.add_argument("--image-dir", default=None)
    p.add_argument("--coco-json", default=None)
    p.add_argument("--mpii-mat", default=None, help="MPII RELEASE .mat")
    p.add_argument("--lsp-mat", default=None, help="LSP joints.mat")
    p.add_argument("--split", default="all",
                   choices=["all", "train", "eval", "test"],
                   help="reference split to select (MPII i%%10 buckets, "
                        "LSP shuffled i%%10==0 eval)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--n-synthetic", type=int, default=32)
    p.add_argument("--synthetic-schema", default=None,
                   choices=["coco", "mpii", "lsp"],
                   help="keypoint schema for --dataset synthetic; defaults "
                        "to the --experiment's dataset schema (else coco), "
                        "so MPII/LSP experiments train synthetically with "
                        "the right joint count and renderer")
    p.add_argument("--synthetic-style", default="blob",
                   choices=["blob", "stickfigure"],
                   help="synthetic image style: 'blob' (identical Gaussian "
                        "blobs at joints — smoke-level signal) or "
                        "'stickfigure' (color-coded articulated persons, "
                        "MPII schema — fully learnable, used by the "
                        "convergence demos)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--decode-backend", default="pil", choices=["pil", "native"],
                   help="'native' = C++ libjpeg thread-pool batch decoder "
                        "(builds on first use; falls back to pil)")
    p.add_argument("--max-persons", type=int, default=13,
                   help="COCO manifest: per-image annotation cap (static "
                        "shapes need a bound; the reference rasterizes every "
                        "annotation, train.py:282-324 — raise to cover "
                        "crowded images, see --strict-manifest)")
    p.add_argument("--max-vertices", type=int, default=128,
                   help="COCO manifest: per-polygon vertex cap")
    p.add_argument("--strict-manifest", action="store_true",
                   help="error (naming the required caps) instead of "
                        "silently truncating annotations past "
                        "--max-persons/--max-vertices")


def resolve_experiment(args):
    """Fill every None-valued flag from the named EXPERIMENTS entry (or the
    global defaults when no --experiment is given). Explicit flags win."""
    cfg = None
    name = getattr(args, "experiment", None)
    if name:
        from progressive_process_for_human_pose_estimation_tpu.config import (
            EXPERIMENTS,
        )

        if name not in EXPERIMENTS:
            raise SystemExit(
                f"unknown experiment {name!r}; have {sorted(EXPERIMENTS)}"
            )
        cfg = EXPERIMENTS[name]

    def fill(attr, cfg_value, default):
        if getattr(args, attr, None) is None:
            setattr(args, attr, cfg_value if cfg is not None else default)

    # Eval-side CLIs (those with an --eval-bn flag) given only a --preset:
    # recover the faithful BN mode + scoring objective from the EXPERIMENTS
    # entries built on that preset (when they agree), instead of silently
    # defaulting to .eval()/'progressive' — running-stat eval scores e.g. a
    # trained hourglass8_skeleton checkpoint at 0% PCKh.
    inf_ebs = inf_obj = None
    if cfg is None and hasattr(args, "eval_bn") and getattr(args, "preset", None):
        inf_ebs, inf_obj = infer_preset_experiment(args.preset)

    fill("preset", cfg.model_preset if cfg else None, "progressive_mpii")
    fill("dataset", cfg.dataset if cfg else None, "synthetic")
    fill("batch_size", cfg.batch_size if cfg else None, 8)
    fill("objective", cfg.objective if cfg else None, inf_obj or "progressive")
    fill("lr", cfg.learning_rate if cfg else None, 1e-4)
    if hasattr(args, "adam_eps"):
        fill("adam_eps", cfg.adam_eps if cfg else None, 1e-4)
    if hasattr(args, "eval_bn"):
        # 'batch' = test-time BN on current-batch statistics (the try_*
        # scripts never call .eval(), so torch train-mode BN is their test
        # behavior — config.ExperimentConfig.eval_batch_stats); 'running' =
        # EMA stats (.eval(), train.py:991). Without --experiment the mode
        # comes from the preset's EXPERIMENTS entries when they agree, else
        # 'running' (the final scripts' behavior).
        fill(
            "eval_bn",
            ("batch" if cfg.eval_batch_stats else "running") if cfg else None,
            ("batch" if inf_ebs else "running") if inf_ebs is not None
            else "running",
        )
    fill("epochs", cfg.epochs if cfg else None, 300)
    fill("input_size", cfg.input_size if cfg else None, 256)
    if cfg is not None and not cfg.augment and hasattr(args, "no_augment"):
        args.no_augment = True
    # Synthetic stand-in data inherits the experiment's keypoint schema, so
    # e.g. `--experiment classic_baseline --dataset synthetic` renders
    # 16-joint MPII-style targets instead of failing head validation.
    if getattr(args, "synthetic_schema", None) is None and hasattr(
        args, "synthetic_schema"
    ):
        exp_ds = cfg.dataset if cfg else None
        args.synthetic_schema = exp_ds if exp_ds in ("mpii", "lsp") else "coco"
    return cfg


def _objective_min_channels(objective, req, n_outputs):
    """Per-output minimum head channels for an objective given the
    renderer's (bg, skeleton-classes, keypoint-classes) requirement. CE
    stages need the full class count; Gauss/MSE stages need one fewer (no
    background class). Returns None when no static rule applies."""
    if len(req) == 1:  # LSP schema: Gaussian maps only
        k = req[0]
        if objective in ("classic_mse", "refine_mse"):
            return (k,) * n_outputs
        return None
    sk, kp = req[1], req[-1]
    k = kp - 1
    table = {
        "progressive": (2, sk, kp),
        # masked: stage 3 is masked MSE on the k-joint Gaussians
        # (try_remove_background_and_costomer_loss.py:375,421).
        "masked": (2, sk, k),
        "progressive_ce_ce_mse": (2, sk, k),
        "ohem_ce_ce_mse": (2, sk, k),
        "progressive_2stage": (2, k),
        "mask_only": (2,) * n_outputs,
        "classic_mse": (k,) * n_outputs,
        "refine_mse": (k,) * n_outputs,
        "single_stack_ce": (kp,) * n_outputs,
        # split-channel CE: first 18 channels vs keypoint classes, the rest
        # vs skeleton classes (try_skeleton_and_keypoints.py:423-435).
        "split_channel": (18 + sk,) * n_outputs,
    }
    return table.get(objective)


def check_heads_match_renderer(model, render_fn, preset: str, objective=None):
    """Fail loudly when the model's head channels can't hold the targets the
    renderer + objective will feed them — CE over fewer logits than the max
    target class silently produces NaN gradients (out-of-range gather), not
    an error. The reference never hits this because each script hard-codes
    matching constants (/root/reference/train.py:44-48).

    With ``objective`` (training) the exact per-stage minima are enforced;
    without (evaluation) a lenient rule flags only heads that can't hold
    the classes under ANY loss (one less than the class count, allowing
    Gauss-regression heads)."""
    req = getattr(render_fn, "required_channels", None)
    oc = getattr(model, "out_channels", None)
    if req is None or oc is None:
        return
    stages = tuple(oc) if isinstance(oc, (tuple, list)) else (oc,)
    need = _objective_min_channels(objective, req, len(stages))
    if need is None:
        if len(req) == 1:
            return  # LSP Gauss schema with a CE-family objective: no rule
        if isinstance(oc, (tuple, list)):
            base = req if len(stages) == len(req) else (req[0], req[-1])
            need = (base[0],) + tuple(n - 1 for n in base[1:])
        else:
            need = (req[-1] - 1,) * len(stages)
    if len(need) != len(stages):
        return  # objective/model stage-count mismatch is caught at step time
    bad = [
        f"stage {i + 1}: head has {got} channels, needs ≥ {n}"
        for i, (got, n) in enumerate(zip(stages, need))
        if got < n
    ]
    if bad:
        raise SystemExit(
            f"model preset {preset!r} does not fit this dataset's targets "
            f"({render_fn.kind} schema: per-stage class counts {req}"
            + (f", objective {objective!r}" if objective else "")
            + "): " + "; ".join(bad)
            + ". Pick a matching preset (e.g. progressive_coco for COCO/"
            "synthetic, progressive_mpii for MPII) or override with "
            "--out-channels."
        )


def build_loader_from_args(args, shuffle=True, drop_remainder=None):
    """Manifest (built or loaded) → split applied → HostLoader.

    ``drop_remainder`` defaults to True for (shuffled) training and False for
    deterministic eval passes — the reference evaluates every sample."""
    from progressive_process_for_human_pose_estimation_tpu.data import (
        HostLoader,
        build_coco_manifest,
        build_lsp_manifest,
        build_mpii_manifest,
        load_manifest,
        select_split,
        synthetic_coco_manifest,
    )

    if args.manifest:
        manifest = load_manifest(args.manifest)
    elif args.dataset == "coco":
        if not args.coco_json:
            raise SystemExit("--coco-json or --manifest required for dataset=coco")
        manifest = build_coco_manifest(
            args.coco_json,
            max_persons=getattr(args, "max_persons", 13),
            max_vertices=getattr(args, "max_vertices", 128),
            strict=getattr(args, "strict_manifest", False),
        )
        trunc = manifest.get("truncation_counts")
        if trunc is not None and int(np.sum(trunc)) > 0:
            print(
                f"WARNING: COCO manifest truncated {int(trunc[0])} persons / "
                f"{int(trunc[1])} polygon vertices past the caps "
                f"(--max-persons {getattr(args, 'max_persons', 13)}, "
                f"--max-vertices {getattr(args, 'max_vertices', 128)}); "
                f"labels on those images diverge from the reference's "
                f"all-annotations render (train.py:282-324). Raise the caps "
                f"or pass --strict-manifest to fail instead."
            )
    elif args.dataset == "mpii":
        if not args.mpii_mat:
            raise SystemExit("--mpii-mat or --manifest required for dataset=mpii")
        manifest = build_mpii_manifest(args.mpii_mat)
    elif args.dataset == "lsp":
        if not args.lsp_mat:
            raise SystemExit("--lsp-mat or --manifest required for dataset=lsp")
        manifest = build_lsp_manifest(args.lsp_mat)
    else:
        from progressive_process_for_human_pose_estimation_tpu.data import (
            synthetic_lsp_manifest,
            synthetic_mpii_manifest,
        )

        if getattr(args, "synthetic_style", "blob") == "stickfigure":
            from progressive_process_for_human_pose_estimation_tpu.data import (
                synthetic_stickfigure_coco_manifest,
                synthetic_stickfigure_manifest,
            )

            schema = getattr(args, "synthetic_schema", None)
            if schema == "lsp":
                raise SystemExit(
                    "--synthetic-style stickfigure renders MPII- or "
                    "COCO-schema persons; got --synthetic-schema lsp"
                )
            builder = (synthetic_stickfigure_manifest if schema == "mpii"
                       else synthetic_stickfigure_coco_manifest)
        else:
            builder = {
                "mpii": synthetic_mpii_manifest,
                "lsp": synthetic_lsp_manifest,
            }.get(getattr(args, "synthetic_schema", None), synthetic_coco_manifest)
        manifest = builder(n_images=args.n_synthetic, seed=args.seed)

    split = getattr(args, "split", "all")
    if split != "all":
        manifest = select_split(manifest, split, seed=args.seed)

    # Multi-host runs: each process loads a disjoint shard of the manifest
    # (per-host sharded file lists, SURVEY.md §5 "Distributed communication
    # backend"). Single-process runs pass through untouched.
    if jax.process_count() > 1:
        from progressive_process_for_human_pose_estimation_tpu.data.manifests import (
            apply_split,
        )
        from progressive_process_for_human_pose_estimation_tpu.parallel import (
            host_shard,
        )

        n = len(manifest["image_names"])
        manifest = apply_split(
            manifest, host_shard(n, seed=args.seed if shuffle else None)
        )

    loader = HostLoader(
        manifest,
        image_dir=args.image_dir,
        batch_size=args.batch_size,
        seed=args.seed,
        shuffle=shuffle,
        drop_remainder=shuffle if drop_remainder is None else drop_remainder,
        decode_backend=getattr(args, "decode_backend", "pil"),
    )
    return manifest, loader
