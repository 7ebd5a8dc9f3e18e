"""PCKh evaluation CLI — replaces /root/reference/train.py mode='test',
test_mode='mpii' (train.py:1120-1146): run the model over an eval/test split,
accumulate per-image PCKh curves on device, print/plot the mean curve.

MPII manifests evaluate with REAL head-rect normalization (the rect scaled
into /4 map space, train.py:692-694 → PCKh standard = 0.6 × diagonal,
train.py:771). COCO/synthetic manifests have no head rects — a fixed
stand-in rect is substituted and reported as such. LSP manifests score the
Gaussian-heatmap PCKh (head-neck/2 standard,
/root/reference/only_one_hourgless.py:285-313).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    add_data_args,
    add_eval_bn_arg,
    add_model_args,
    build_eval_model_from_args,
    build_loader_from_args,
    check_heads_match_renderer,
    resolve_experiment,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p)
    p.add_argument("--experiment", default=None,
                   help="config.EXPERIMENTS preset (explicit flags override)")
    p.add_argument("--load", default=None, help="checkpoint to evaluate")
    p.add_argument("--stage", type=int, default=-1,
                   help="which stage output to score (default: last)")
    p.add_argument("--no-background-offset", action="store_true",
                   help="baseline-model scoring (PCKh_hourglass): joint j in "
                        "channel j, raw maps, no softmax; implied by "
                        "--experiment entries with the classic_mse objective")
    p.add_argument("--fold", action="store_true",
                   help="inference-only tail fold (StackedHourglass + "
                        "ProgressiveHourglass presets): skip the non-final "
                        "stacks' head/merge/return convs via one folded "
                        "matmul — exact same final-stage scores, faster; "
                        "requires --stage -1")
    p.add_argument("--plot", default=None, help="save detection-rate curve PNG")
    p.add_argument("--input-size", type=int, default=None)
    add_eval_bn_arg(p)
    args = p.parse_args(argv)
    resolve_experiment(args)
    return args


# Objectives whose FINAL stage regresses Gaussian maps (no background
# channel): classic_mse (hourglass_compare.py:936-941), progressive_2stage
# (try_different_stack_without_skeleton.py:360-393 — stage 2 = 17-ch MSE),
# progressive_ce_ce_mse (try_more_layer.py:403-406 — stage 3 = MSE Gaussians),
# masked (try_remove_background_and_costomer_loss.py:375,421 — stage 3 =
# masked MSE Gaussians).
GAUSS_FINAL_OBJECTIVES = {"classic_mse", "progressive_2stage",
                          "progressive_ce_ce_mse", "ohem_ce_ce_mse", "masked"}

# Split-channel models concatenate TWO independent CE blocks in one head
# (channels [:18] = bg+17 keypoints, [18:] = bg+19 skeleton,
# try_skeleton_and_keypoints.py:423-435). PCKh reads joints from the keypoint
# block, and the softmax must span only that block — normalizing across both
# blocks mixes two unrelated distributions and shifts per-channel argmaxes.
KP_BLOCK_OBJECTIVES = {"split_channel": 18}


def scoring_mode(args):
    """(gauss_head, background_offset) for the non-LSP PCKh path. Gauss/MSE
    heads score joint j from channel j on raw maps (PCKh_hourglass,
    /root/reference/performance_compare.py:581-615); CE heads softmax and
    read joint j from channel j+1 past the background. The mode follows the
    objective's FINAL stage; when scoring an earlier CE stage of a mixed
    objective via --stage, pass flags explicitly."""
    gauss_head = (getattr(args, "objective", None) in GAUSS_FINAL_OBJECTIVES
                  or args.no_background_offset)
    return gauss_head, not gauss_head


def main(argv=None):
    args = parse_args(argv)

    from progressive_process_for_human_pose_estimation_tpu.data import make_render_fn
    from progressive_process_for_human_pose_estimation_tpu.eval import (
        PCKH_THRESHOLDS,
        pckh_curve,
        pckh_gauss_curve,
    )
    from progressive_process_for_human_pose_estimation_tpu.train import (
        create_train_state,
        restore_checkpoint,
    )

    size = args.input_size
    manifest, loader = build_loader_from_args(args, shuffle=False)
    render_fn = make_render_fn(manifest, inputsize=size, augment=False)
    loader.staging_size = render_fn.staging_size

    if args.fold and args.stage != -1:
        raise SystemExit("--fold produces only the final stage's output; "
                         "it cannot be combined with --stage != -1")
    model, apply_fn, _ = build_eval_model_from_args(args, fold=args.fold)
    check_heads_match_renderer(model, render_fn, args.preset)
    sample = jnp.zeros((args.batch_size, size, size, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), sample)
    if args.load:
        state = restore_checkpoint(args.load, state)

    def outputs_of(params, batch_stats, images):
        outs = apply_fn({"params": params, "batch_stats": batch_stats}, images)
        return outs[args.stage].astype(jnp.float32)

    if render_fn.kind == "lsp":
        # LSP path: real per-threshold Gaussian-target curve (standard =
        # head-neck distance; t=0.5 equals the reference's pckh_simple test).
        @jax.jit
        def eval_batch(params, batch_stats, batch):
            out = outputs_of(params, batch_stats, batch["image"])
            return pckh_gauss_curve(out, batch["gauss_maps"])

    else:
        # Gauss/MSE-headed models (classic_baseline) have NO background
        # channel: joint j lives in channel j and the maps are regression
        # targets, not logits. The reference scores them with
        # PCKh_hourglass — no channel offset, raw maps
        # (/root/reference/performance_compare.py:581-615). Cross-channel
        # softmax would also distort per-channel argmax locations (the
        # denominator varies per pixel), so it applies only to CE heads.
        gauss_head, offset = scoring_mode(args)
        kp_block = KP_BLOCK_OBJECTIVES.get(getattr(args, "objective", None))

        @jax.jit
        def eval_batch(params, batch_stats, batch):
            out = outputs_of(params, batch_stats, batch["image"])
            if kp_block is not None:
                out = out[..., :kp_block]
            hm = out if gauss_head else jax.nn.softmax(out, axis=-1)
            res = pckh_curve(hm, batch["keypoint_map"], batch["head_rect"],
                             background_offset=offset)
            return res.accuracy

    if render_fn.kind == "coco":
        print("note: COCO/synthetic manifests carry no head rects; using a "
              "fixed 16px stand-in rect for the PCKh standard")

    curves = []
    for host in loader:
        batch = dict(render_fn(jax.random.PRNGKey(0), host))
        if "head_rect" not in batch and render_fn.kind != "lsp":
            n = batch["image"].shape[0]
            batch["head_rect"] = jnp.tile(
                jnp.asarray([0.0, 0.0, 16.0, 16.0]), (n, 1)
            )
        acc = eval_batch(state.params, state.batch_stats, batch)
        curves.append(np.asarray(acc))

    curve = np.nanmean(np.concatenate(curves, axis=0), axis=0)
    for t, a in zip(np.asarray(PCKH_THRESHOLDS), curve):
        print(f"PCKh@{t:.2f}: {a * 100:.2f}%")
    if args.plot:
        from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
            MetricLogger,
        )

        MetricLogger().save_accuracy_curve(args.plot, PCKH_THRESHOLDS, curve)
    return curve


if __name__ == "__main__":
    main()
