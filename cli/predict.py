"""Qualitative prediction on ad-hoc images — replaces the reference's
``mode='test', test_mode='test'`` path (/root/reference/train.py:1288-1327):
load an image, resize to the input size, run the model, save a figure with
the input, the argmax mask/skeleton/keypoint maps, and decoded keypoints
drawn on the image (threshold decode, train.py:1060-1068)."""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from .common import (
    add_eval_bn_arg,
    add_model_args,
    build_eval_model_from_args,
    resolve_experiment,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("image", nargs="*", default=None,
                   help="path(s) to input photo(s) (omit for a synthetic "
                        "image). With several images the model, checkpoint "
                        "and compiled computation are shared across all of "
                        "them — the reference's test branch loops a whole "
                        "directory this way (/root/reference/train.py:1288)")
    p.add_argument("--load", default=None, help="checkpoint to use")
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--out", default="prediction.png",
                   help="output figure path; with several input images, a "
                        "DIRECTORY that receives one <stem>.png per input")
    p.add_argument("--out-suffix", default="",
                   help="suffix appended to each output stem in multi-image "
                        "mode (e.g. '_crf')")
    p.add_argument("--threshold", type=float, default=1.0,
                   help="peak confidence threshold (reference `threshold`)")
    p.add_argument("--mask-gate", action="store_true",
                   help="gate the input through a MaskNet person mask before "
                        "the pose model: mask -> nearest x4 upsample -> argmax "
                        "-> multiply into the input "
                        "(/root/reference/train.py:1005-1038)")
    p.add_argument("--mask-load", default=None,
                   help="MaskNet checkpoint for --mask-gate (untrained "
                        "MaskNet weights otherwise)")
    p.add_argument("--experiment", default=None,
                   help="config.EXPERIMENTS preset (explicit flags override); "
                        "also resolves the faithful --eval-bn mode")
    p.add_argument("--crf", action="store_true",
                   help="dense-CRF mean-field refinement of the final "
                        "stage's softmax before decode (the reference ships "
                        "this helper with its pydensecrf constants, "
                        "try_different_stack.py:332-349, though no script "
                        "calls it). Decode then runs on refined "
                        "PROBABILITIES: --threshold defaults to 0 here "
                        "(pass e.g. 0.2 to require confident peaks)")
    p.add_argument("--crf-iters", type=int, default=10,
                   help="mean-field iterations for --crf")
    p.add_argument("--crf-window", action="store_true",
                   help="use the truncated-window CRF approximation instead "
                        "of the exact dense mean-field. The exact O(N^2) "
                        "form is the default — on TPU it is two MXU matmuls "
                        "per iteration at the 64x64 heatmap size and matches "
                        "pydensecrf's dense pairwise model; the window drops "
                        "the long-range sxy=67 bilateral (measured gap vs "
                        "exact at 16x16: mean TV ~0.1, peak TV up to ~0.8 on "
                        "ambiguous pixels — tests/test_variants.py)")
    p.add_argument("--refine", action="store_true",
                   help="refine the final-stage heatmaps through a RefinerD "
                        "(creatModelD, only_one_hourgless.py:257-283): its "
                        "input is concat[final heatmaps, /4-downsampled "
                        "image] (model.py:121-143); the refined output "
                        "replaces the final stage before decode")
    p.add_argument("--refine-load", default=None,
                   help="RefinerD checkpoint for --refine (untrained "
                        "refiner weights otherwise)")
    p.add_argument("--refine-out-channels", default=None,
                   help="RefinerD head channels (default: the base model's "
                        "final-stage channel count)")
    p.add_argument("--decode", default="argmax",
                   choices=["argmax", "normalized-peak", "nms"],
                   help="keypoint decode: 'argmax' = per-channel argmax + "
                        "threshold (train.py:1060-1068); 'normalized-peak' "
                        "= min-max normalize each channel and mark EVERY "
                        "pixel above --threshold (default 0.7 here, "
                        "try_different_stack.py:485-498); 'nms' = argmax "
                        "restricted to 3x3 local maxima "
                        "(ndimage.maximum_filter as a reduce_window, "
                        "try_different_stack_without_skeleton.py:486-492)")
    add_eval_bn_arg(p)
    args = p.parse_args(argv)
    resolve_experiment(args)
    return args


def main(argv=None):
    args = parse_args(argv)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from progressive_process_for_human_pose_estimation_tpu.eval import argmax_decode
    from progressive_process_for_human_pose_estimation_tpu.train import (
        create_train_state,
        restore_checkpoint,
    )
    from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
        colorize_class_map,
    )

    size = args.input_size

    def load_image(path):
        if path:
            from PIL import Image

            return np.asarray(
                Image.open(path).convert("RGB").resize((size, size)),
                np.float32,
            ) / 255.0
        from progressive_process_for_human_pose_estimation_tpu.data.synthetic import (
            synthetic_coco_manifest,
            synthetic_image,
        )

        m = synthetic_coco_manifest(n_images=1, img_size=size, seed=1)
        return synthetic_image(m["keypoints"][0], img_size=size, seed=1)

    # Model/checkpoint/compile are per-INVOCATION, not per-image: everything
    # below this point is shared across the image list, so a directory sweep
    # pays one restore + one jit trace total.
    import os

    images = list(args.image) if args.image else [None]
    multi = len(images) > 1 or (images[0] is not None
                                and os.path.isdir(args.out))
    if multi:
        os.makedirs(args.out, exist_ok=True)

    model, apply_fn, batch_bn = build_eval_model_from_args(args)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0)
    if args.load:
        state = restore_checkpoint(args.load, state)

    mask_state = mask_apply = None
    if args.mask_gate:
        # generateMask-gated composition (/root/reference/train.py:1020-1038):
        # mask logits at /4 -> nearest x4 (F.interpolate default) -> argmax
        # over {bg, person} -> hard-multiply into the input image. Upsample
        # and argmax commute for nearest-neighbour, so argmax first.
        import copy

        # Same construction path as the pose model (precision policy,
        # feature/depth flags stay in lockstep), just the masknet preset
        # with its own 2-channel head.
        margs = copy.copy(args)
        margs.preset = "masknet"
        margs.out_channels = None
        # The mask net follows the pose model's BN mode: the reference's
        # generatemask is never .eval()'d at test time (the call is commented
        # out, train.py:990/997), so its mode is ambiguous there; keeping
        # both nets in lockstep is the one consistent reading.
        masknet, mask_apply, _ = build_eval_model_from_args(margs)
        mask_state = create_train_state(masknet, jax.random.PRNGKey(0), x0)
        if args.mask_load:
            mask_state = restore_checkpoint(args.mask_load, mask_state)

    refiner_cache = {}

    def predict_one(img):
        x = jnp.asarray(img)[None]
        gate = None
        if args.mask_gate:
            mask = mask_apply(
                {"params": mask_state.params,
                 "batch_stats": mask_state.batch_stats}, x
            )[0]
            gate = jnp.argmax(mask.astype(jnp.float32), axis=-1)  # (1,S/4,S/4)
            gate = jnp.repeat(jnp.repeat(gate, 4, axis=1), 4, axis=2)
            x = x * gate[..., None].astype(x.dtype)

        outs = apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, x)
        raw_final = outs[-1].astype(jnp.float32)

        if args.refine:
            # RefinerD pass (creatModelD, only_one_hourgless.py:257-283):
            # input = concat[final-stage heatmaps, /4-downsampled image]
            # (model.py:122's nOutChannels+3), output = refined heatmaps that
            # replace the final stage for decode.
            import copy

            h, w = raw_final.shape[1], raw_final.shape[2]
            img_small = jax.image.resize(x.astype(jnp.float32), (1, h, w, 3),
                                         "bilinear")
            rx = jnp.concatenate([raw_final, img_small], axis=-1)
            if "state" not in refiner_cache:
                rargs = copy.copy(args)
                rargs.preset = "refiner"
                rargs.out_channels = (args.refine_out_channels
                                      or raw_final.shape[-1])
                refiner, refine_apply, _ = build_eval_model_from_args(rargs)
                rstate = create_train_state(refiner, jax.random.PRNGKey(0), rx)
                if args.refine_load:
                    rstate = restore_checkpoint(args.refine_load, rstate)
                refiner_cache["state"] = rstate
                refiner_cache["apply"] = refine_apply
            rstate = refiner_cache["state"]
            refined = refiner_cache["apply"](
                {"params": rstate.params, "batch_stats": rstate.batch_stats},
                rx)
            refined = (refined[-1] if isinstance(refined, (list, tuple))
                       else refined).astype(jnp.float32)
            outs = list(outs[:-1]) + [refined]
            raw_final = refined

        outs = [jax.nn.softmax(o.astype(jnp.float32), axis=-1) for o in outs]
        return x, gate, outs, raw_final

    for path in images:
        img = load_image(path)
        x, gate, outs, raw_final = predict_one(img)

        if args.crf:
            # Mean-field refinement at heatmap resolution against the
            # (resized) input image, then decode from the refined
            # probabilities.
            from progressive_process_for_human_pose_estimation_tpu.eval import (
                dense_crf,
                dense_crf_exact,
            )

            hm = outs[-1][0]
            h, w = hm.shape[0], hm.shape[1]
            img_small = jax.image.resize(
                jnp.asarray(img, jnp.float32), (h, w, 3), "bilinear"
            )
            if args.crf_window:
                refined = dense_crf(img_small, hm, n_iters=args.crf_iters)
            else:
                refined = dense_crf_exact(img_small, hm,
                                          n_iters=args.crf_iters)
            outs[-1] = refined[None]
            threshold = 0.0 if args.threshold == 1.0 else args.threshold
            decode_maps = outs[-1]
        else:
            # Threshold on the RAW final maps (the reference thresholds
            # result[...] pre-softmax, train.py:1060-1068, default
            # threshold=1 — softmaxed values never exceed 1, so thresholding
            # them would reject every peak).
            threshold, decode_maps = args.threshold, raw_final
        scale = size // raw_final.shape[1]
        if args.decode == "argmax":
            coords, valid = argmax_decode(decode_maps, threshold=threshold,
                                          scale=scale)
            coords, valid = np.asarray(coords[0]), np.asarray(valid[0])
            points = [(px, py) for (px, py), ok in zip(coords, valid) if ok]
        elif args.decode == "normalized-peak":
            from progressive_process_for_human_pose_estimation_tpu.eval import (
                normalized_peak_decode,
            )

            # Min-max normalization makes the raw/prob scale irrelevant; the
            # reference's threshold is 0.7 (try_different_stack.py:487).
            thr = 0.7 if args.threshold == 1.0 else args.threshold
            mask, _ = normalized_peak_decode(decode_maps, threshold=thr)
            ys, xs, _cs = np.where(np.asarray(mask[0]))
            points = list(zip(xs * scale, ys * scale))
        else:  # nms: ALL local maxima above threshold (multi-peak decode)
            from progressive_process_for_human_pose_estimation_tpu.eval import (
                local_max_nms,
            )

            nms = np.asarray(local_max_nms(decode_maps)[0])
            above = np.asarray(decode_maps[0]) > threshold
            ys, xs, _cs = np.where(nms & above)
            points = list(zip(xs * scale, ys * scale))

        n_panels = 1 + (1 if gate is not None else 0) + len(outs) + 1
        fig, axes = plt.subplots(1, n_panels, figsize=(4 * n_panels, 4))
        all_axes = list(axes)
        axes[0].imshow(img)
        axes[0].set_title("input")
        if gate is not None:
            axes[1].imshow(np.asarray(x[0], np.float32))
            axes[1].set_title("mask-gated input")
            axes = axes[1:]
        titles = ["mask", "skeleton", "keypoints"]
        for i, o in enumerate(outs):
            cls = np.argmax(np.asarray(o[0]), axis=-1)
            axes[1 + i].imshow(colorize_class_map(cls, o.shape[-1]))
            axes[1 + i].set_title(titles[i] if i < len(titles)
                                  else f"stage {i}")
        axes[-1].imshow(img)
        for px, py in points:
            axes[-1].plot(px, py, "o", markersize=4)
        axes[-1].set_title(f"decoded keypoints ({args.decode})")
        for ax in all_axes:
            ax.axis("off")
        if multi:
            stem = os.path.splitext(os.path.basename(path))[0]
            out_path = os.path.join(args.out, stem + args.out_suffix + ".png")
        else:
            out_path = args.out
        fig.savefig(out_path, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {out_path} ({len(points)} peaks above threshold)")


if __name__ == "__main__":
    main()
