"""Training CLI — replaces /root/reference/train.py main() (mode='train',
train.py:794-987) with config flags instead of edited module constants.

Example (synthetic smoke run):
    python -m cli.train --preset progressive_coco --epochs 2 \
        --features 32 --hourglass-depth 2 --batch-size 4 --n-synthetic 8
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
    p.add_argument("--objective", default="progressive",
                   help="objective name (see train.objectives.OBJECTIVES)")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save", default=None, help="checkpoint path (per-epoch save)")
    p.add_argument("--load", default=None, help="checkpoint to resume/fine-tune from")
    p.add_argument("--retrain", action="store_true",
                   help="ignore existing checkpoint (reference `retrain` flag)")
    p.add_argument("--fine-tune", action="store_true",
                   help="shape-filtered warm start (reference `fine_tune`)")
    p.add_argument("--logdir", default=None, help="TensorBoard runs/ dir")
    p.add_argument("--experiment", default="experiment")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--image-every", type=int, default=100)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--input-size", type=int, default=256,
                   help="must be divisible by 2**(2 + hourglass depth)")
    p.add_argument("--prefetch-threads", type=int, default=0,
                   help="decode images with N threads + prefetch queue "
                        "(the reference's num_workers analogue; 0 = inline)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from progressive_process_for_human_pose_estimation_tpu.data import make_coco_batch_fn
    from progressive_process_for_human_pose_estimation_tpu.parallel import (
        make_mesh,
        shard_batch,
    )
    from progressive_process_for_human_pose_estimation_tpu.train import (
        create_train_state,
        make_train_step,
        maybe_resume,
        save_checkpoint,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
        OBJECTIVES,
    )
    from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
        MetricLogger,
    )

    size = args.input_size
    rescale = size * 320 // 256
    manifest, loader = build_loader_from_args(args)
    loader.staging_size = size if args.no_augment else rescale
    if args.prefetch_threads > 0:
        from progressive_process_for_human_pose_estimation_tpu.data import (
            PrefetchLoader,
        )

        loader = PrefetchLoader(loader, num_threads=args.prefetch_threads)
    batch_fn = make_coco_batch_fn(
        manifest["skeleton"], inputsize=size, rescale_size=rescale,
        augment=not args.no_augment,
    )

    model = build_model_from_args(args)
    sample = jnp.zeros((args.batch_size, size, size, 3))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), sample, args.lr)
    if args.load:
        state = maybe_resume(args.load, state, retrain=args.retrain,
                             fine_tune=args.fine_tune)

    objective = OBJECTIVES[args.objective]
    step_fn = make_train_step(model, objective, donate=False)
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 and args.batch_size % n_dev == 0 else None
    logger = MetricLogger(args.logdir, args.experiment)

    key = jax.random.PRNGKey(args.seed + 1)
    start_epoch = int(state.epoch)
    for epoch in range(start_epoch, args.epochs):
        for i, host in enumerate(loader):
            key, sub = jax.random.split(key)
            rendered = batch_fn(
                sub,
                jnp.asarray(host["images"]),
                jnp.asarray(host["keypoints"]),
                jnp.asarray(host["polygons"]),
                jnp.asarray(host["n_vertices"]),
                jnp.asarray(host["n_persons"]),
                jnp.asarray(host["src_dims"]),
            )
            batch = dict(rendered)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            if i % args.log_every == 0:
                m = jax.device_get(metrics)
                step = i + len(loader) * epoch
                logger.log_scalars(step, {k: v for k, v in m.items() if k != "finite"})
                logger.print_progress(epoch, args.epochs, i, len(loader), m["loss"])
        state = state.replace(epoch=state.epoch + 1)
        if args.save:
            save_checkpoint(args.save, state)
    if args.save:
        logger.save_loss_curve(args.save.rstrip("/") + "_loss.png")
    logger.close()
    return state


if __name__ == "__main__":
    main()
