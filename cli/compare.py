"""Two-model side-by-side PCKh — replaces
/root/reference/performance_compare.py:618-762: load two presets (+optional
checkpoints), run both on the same batches, report both detection-rate
curves. With an MPII manifest the curves use REAL head-rect normalization
(performance_compare.py:646-647: progressive scored with the background-
channel offset, the baseline without)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    add_data_args,
    add_eval_bn_arg,
    build_eval_model_from_args,
    build_loader_from_args,
    infer_preset_experiment,
    resolve_experiment,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--preset-a", default="progressive_mpii")
    p.add_argument("--preset-b", default="classic_baseline")
    p.add_argument("--load-a", default=None)
    p.add_argument("--load-b", default=None)
    p.add_argument("--features", type=int, default=None)
    p.add_argument("--hourglass-depth", type=int, default=None)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    # Per-side test-time BN: an explicit --eval-bn applies to BOTH models;
    # otherwise each side resolves from its preset's EXPERIMENTS entries
    # (performance_compare.py:619-620 .eval()s its two models — both map to
    # eval_batch_stats=False presets, so the canonical comparison stays on
    # running stats; try_*-derived presets get their faithful batch mode).
    add_eval_bn_arg(p)
    args = p.parse_args(argv)
    # Remember whether the user pinned a mode BEFORE resolution fills the
    # default — per-side inference in main() applies only when they didn't.
    args.eval_bn_explicit = args.eval_bn is not None
    resolve_experiment(args)
    return args


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

    import copy

    from .evaluate import KP_BLOCK_OBJECTIVES

    results = {}
    sample = jnp.zeros((args.batch_size, size, size, 3))
    for tag, preset, load, offset in [
        ("a", args.preset_a, args.load_a, True),
        ("b", args.preset_b, args.load_b, False),
    ]:
        side = copy.copy(args)
        side.preset = preset
        ebs, obj = infer_preset_experiment(preset)
        if not args.eval_bn_explicit:
            side.eval_bn = "batch" if ebs else "running"
        # Split-channel models score PCKh from a softmax over only their
        # keypoint CE block (same scoping as cli.evaluate).
        kp_block = KP_BLOCK_OBJECTIVES.get(obj)
        model, apply_fn, _ = build_eval_model_from_args(side)
        state = create_train_state(model, jax.random.PRNGKey(0), sample)
        if load:
            state = restore_checkpoint(load, state)

        if render_fn.kind == "lsp":
            # LSP schema renders Gaussian targets only: score both models
            # with the Gaussian-target curve (same as cli.evaluate's LSP
            # path; head-neck standard).
            @jax.jit
            def eval_batch_lsp(params, batch_stats, images, gauss,
                               apply_fn=apply_fn):
                outs = apply_fn(
                    {"params": params, "batch_stats": batch_stats}, images
                )
                return pckh_gauss_curve(outs[-1].astype(jnp.float32), gauss)

        else:
            @jax.jit
            def eval_batch(params, batch_stats, images, target, rect,
                           apply_fn=apply_fn, offset=offset,
                           kp_block=kp_block):
                outs = apply_fn({"params": params, "batch_stats": batch_stats}, images)
                out = outs[-1].astype(jnp.float32)
                if kp_block is not None:
                    out = out[..., :kp_block]
                # CE heads (offset=True) softmax and skip the background
                # channel; Gauss/MSE heads (offset=False) score raw maps —
                # cross-channel softmax would move per-channel argmaxes (the
                # denominator varies per pixel), same semantics as
                # cli.evaluate.scoring_mode.
                hm = jax.nn.softmax(out, axis=-1) if offset else out
                return pckh_curve(hm, target, rect, background_offset=offset).accuracy

        curves = []
        for host in loader:
            rendered = dict(render_fn(jax.random.PRNGKey(0), host))
            if render_fn.kind == "lsp":
                acc = eval_batch_lsp(state.params, state.batch_stats,
                                     rendered["image"], rendered["gauss_maps"])
            else:
                n = rendered["image"].shape[0]
                rect = rendered.get(
                    "head_rect",
                    jnp.tile(jnp.asarray([0.0, 0.0, 16.0, 16.0]), (n, 1)),
                )
                acc = eval_batch(state.params, state.batch_stats,
                                 rendered["image"], rendered["keypoint_map"],
                                 rect)
            curves.append(np.asarray(acc))
        results[tag] = np.nanmean(np.concatenate(curves, axis=0), axis=0)

    print(f"{'thr':>6} {'model A (' + args.preset_a + ')':>28} "
          f"{'model B (' + args.preset_b + ')':>28}")
    for t, a, b in zip(np.asarray(PCKH_THRESHOLDS), results["a"], results["b"]):
        print(f"{t:>6.2f} {a * 100:>28.2f} {b * 100:>28.2f}")
    return results


if __name__ == "__main__":
    main()
