"""PCKh evaluation CLI — replaces /root/reference/train.py mode='test',
test_mode='mpii' (train.py:1120-1146): run the model over an eval split,
accumulate per-image PCKh curves on device, print/plot the mean curve.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_data_args, add_model_args, build_loader_from_args, build_model_from_args


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p)
    p.add_argument("--load", default=None, help="checkpoint to evaluate")
    p.add_argument("--stage", type=int, default=-1,
                   help="which stage output to score (default: last)")
    p.add_argument("--no-background-offset", action="store_true",
                   help="baseline-model channel indexing (PCKh_hourglass)")
    p.add_argument("--plot", default=None, help="save detection-rate curve PNG")
    p.add_argument("--input-size", type=int, default=256)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from progressive_process_for_human_pose_estimation_tpu.data import make_coco_batch_fn
    from progressive_process_for_human_pose_estimation_tpu.eval import (
        PCKH_THRESHOLDS,
        pckh_curve,
    )
    from progressive_process_for_human_pose_estimation_tpu.train import (
        create_train_state,
        restore_checkpoint,
    )

    size = args.input_size
    rescale = size * 320 // 256
    manifest, loader = build_loader_from_args(args, shuffle=False)
    # No augmentation at eval: stage directly at the input size (the crop in
    # the renderer is then an identity), like the reference's eval resize.
    loader.staging_size = size
    batch_fn = make_coco_batch_fn(
        manifest["skeleton"], inputsize=size, rescale_size=rescale, augment=False
    )

    model = build_model_from_args(args, use_running_average=True)
    sample = jnp.zeros((args.batch_size, size, size, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), sample)
    if args.load:
        state = restore_checkpoint(args.load, state)

    @jax.jit
    def eval_batch(params, batch_stats, images, target, rect):
        outs = model.apply({"params": params, "batch_stats": batch_stats}, images)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        hm = jax.nn.softmax(outs[args.stage].astype(jnp.float32), axis=-1)
        res = pckh_curve(hm, target, rect,
                         background_offset=not args.no_background_offset)
        return res.accuracy

    curves = []
    for host in loader:
        rendered = batch_fn(
            jax.random.PRNGKey(0),
            jnp.asarray(host["images"]),
            jnp.asarray(host["keypoints"]),
            jnp.asarray(host["polygons"]),
            jnp.asarray(host["n_vertices"]),
            jnp.asarray(host["n_persons"]),
            jnp.asarray(host["src_dims"]),
        )
        # Synthetic/COCO path has no head rects; use the label-map extent as
        # a stand-in standard when absent (real MPII eval passes head_rect).
        n = rendered["image"].shape[0]
        rect = jnp.asarray(host.get("head_rects", np.tile([0, 0, 16, 16], (n, 1))),
                           jnp.float32)
        acc = eval_batch(state.params, state.batch_stats, rendered["image"],
                         rendered["keypoint_map"], rect)
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
