"""Training CLI — replaces /root/reference/train.py main() (mode='train',
train.py:794-987) with config flags instead of edited module constants.

Dataset paths are schema-dispatched (COCO / MPII / LSP renderers —
/root/reference/train.py:204-340, 649-708, data_argumentation.py:10-52), and
``--experiment <name>`` resolves a full config preset (model + objective +
data) from config.EXPERIMENTS.

Examples:
    # synthetic smoke run
    python -m cli.train --preset progressive_coco --epochs 2 \
        --features 32 --hourglass-depth 2 --batch-size 4 --n-synthetic 8
    # the reference's canonical workflow: MPII train split
    python -m cli.train --experiment progressive_mpii_final \
        --mpii-mat RELEASE.mat --image-dir images/ --split train
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    add_data_args,
    add_model_args,
    build_eval_model_from_args,
    build_loader_from_args,
    build_model_from_args,
    check_heads_match_renderer,
    infer_preset_experiment,
    resolve_experiment,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p)
    p.add_argument("--experiment", default=None,
                   help="config.EXPERIMENTS preset resolving model/objective/"
                        "data defaults (explicit flags override)")
    p.add_argument("--objective", default=None,
                   help="objective name (see train.objectives.OBJECTIVES)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--adam-eps", type=float, default=None,
                   help="Adam epsilon (default: the experiment's value — "
                        "1e-4 for the train.py/hourglass_compare presets, "
                        "torch's 1e-8 for the try_*-derived ones)")
    p.add_argument("--save", default=None, help="checkpoint path (per-epoch save)")
    p.add_argument("--save-every", type=int, default=1,
                   help="checkpoint every N epochs (the final epoch is always "
                        "saved; the reference saves per epoch — train.py:959; "
                        "raise on slow filesystems/tunnels)")
    p.add_argument("--load", default=None, help="checkpoint to resume/fine-tune from")
    p.add_argument("--retrain", action="store_true",
                   help="ignore existing checkpoint (reference `retrain` flag)")
    p.add_argument("--fine-tune", action="store_true",
                   help="shape-filtered warm start (reference `fine_tune`)")
    p.add_argument("--logdir", default=None, help="TensorBoard runs/ dir")
    p.add_argument("--run-name", default=None,
                   help="TB run directory name (default: experiment or preset)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--image-every", type=int, default=100,
                   help="log prediction image grids every N steps (0 = off; "
                        "reference cadence: train.py:915-956)")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--input-size", type=int, default=None,
                   help="must be divisible by 2**(2 + hourglass depth)")
    p.add_argument("--prefetch-threads", type=int, default=0,
                   help="decode images with N threads + prefetch queue "
                        "(the reference's num_workers analogue; 0 = inline)")
    p.add_argument("--async-save", action="store_true",
                   help="overlap checkpoint writes with the next epoch "
                        "(orbax async save)")
    p.add_argument("--refine-base", default=None,
                   help="train a RefinerD (creatModelD, only_one_hourgless"
                        ".py:257-283) on top of this FROZEN base model "
                        "preset: each batch's input becomes concat[base "
                        "final-stage heatmaps, /4-downsampled image] "
                        "(model.py:121-143's nOutChannels+3 input). Use "
                        "with --preset refiner --objective refine_mse")
    p.add_argument("--refine-base-load", default=None,
                   help="checkpoint for the frozen --refine-base model "
                        "(untrained base weights otherwise)")
    args = p.parse_args(argv)
    if args.save_every < 1:
        p.error("--save-every must be >= 1 (the final epoch is always saved)")
    resolve_experiment(args)
    return args


def main(argv=None):
    args = parse_args(argv)

    from progressive_process_for_human_pose_estimation_tpu.data import make_render_fn
    from progressive_process_for_human_pose_estimation_tpu.train import (
        create_train_state,
        donation_supported,
        fit_epoch,
        load_loss_history,
        make_train_step,
        maybe_resume,
        save_checkpoint,
        wait_for_checkpoints,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
        OBJECTIVES,
    )
    from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
        DeviceLossTrace,
        MetricLogger,
    )

    from progressive_process_for_human_pose_estimation_tpu import parallel

    # Multi-host: no-op unless JAX_COORDINATOR_ADDRESS etc. are configured;
    # afterwards build_loader_from_args gives this process its manifest shard.
    parallel.initialize()

    from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
        GAUSS_CONSUMERS,
    )

    size = args.input_size
    manifest, loader = build_loader_from_args(args)
    # Skip the per-sample Gaussian render for objectives that never read
    # gauss_maps (the LSP renderer is inherently Gaussian and ignores this).
    render_fn = make_render_fn(manifest, inputsize=size,
                               augment=not args.no_augment,
                               render_gauss=args.objective in GAUSS_CONSUMERS)
    loader.staging_size = render_fn.staging_size
    if args.prefetch_threads > 0:
        from progressive_process_for_human_pose_estimation_tpu.data import (
            PrefetchLoader,
        )

        loader = PrefetchLoader(loader, num_threads=args.prefetch_threads)

    model = build_model_from_args(args)
    check_heads_match_renderer(model, render_fn, args.preset, args.objective)

    # RefinerD composition (--refine-base): a FROZEN base model turns each
    # rendered batch's image into the refiner input concat[final-stage
    # heatmaps, /4-downsampled image] (creatModelD's nOutChannels+3 input,
    # /root/reference/only_one_hourgless.py:259, model.py:122). Only the
    # refiner's TrainState is optimized; the base runs as a jitted
    # eval-mode forward in its faithful BN mode.
    refine_compose = None
    if args.refine_base:
        import copy

        from progressive_process_for_human_pose_estimation_tpu.train import (
            restore_checkpoint,
        )

        bargs = copy.copy(args)
        bargs.preset = args.refine_base
        bargs.out_channels = None
        ebs, _ = infer_preset_experiment(args.refine_base)
        bargs.eval_bn = "batch" if (ebs if ebs is not None else True) else "running"
        base_model, base_apply, _ = build_eval_model_from_args(bargs)
        bstate = create_train_state(
            base_model, jax.random.PRNGKey(0),
            jnp.zeros((args.batch_size, size, size, 3)))
        if args.refine_base_load:
            bstate = restore_checkpoint(args.refine_base_load, bstate)
        base_vars = {"params": bstate.params, "batch_stats": bstate.batch_stats}
        base_oc = base_model.out_channels
        base_c = base_oc[-1] if isinstance(base_oc, (tuple, list)) else base_oc
        hm_size = size // 4

        @jax.jit
        def _compose(variables, images):
            outs = base_apply(variables, images)
            hm = (outs[-1] if isinstance(outs, (list, tuple)) else outs)
            hm = jax.lax.stop_gradient(hm.astype(jnp.float32))
            small = jax.image.resize(
                images.astype(jnp.float32),
                (images.shape[0], hm_size, hm_size, 3), "bilinear")
            return jnp.concatenate([hm, small], axis=-1)

        def refine_compose(batch):
            batch = dict(batch)
            batch["image"] = _compose(base_vars, batch["image"])
            return batch

        inner_render = render_fn

        class _ComposedRender:
            staging_size = inner_render.staging_size
            kind = getattr(inner_render, "kind", None)

            def __call__(self, key, host_batch):
                return refine_compose(dict(inner_render(key, host_batch)))

        render_fn = _ComposedRender()
        sample = jnp.zeros((args.batch_size, hm_size, hm_size, base_c + 3))
    else:
        sample = jnp.zeros((args.batch_size, size, size, 3))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), sample,
                               args.lr, eps=args.adam_eps)
    if args.load:
        state = maybe_resume(args.load, state, retrain=args.retrain,
                             fine_tune=args.fine_tune)

    objective = OBJECTIVES[args.objective]
    # Donate where the backend supports it: the step then consumes the old
    # TrainState buffers in place (orbax save copies device->host before
    # returning, so the async checkpoint never races the donation). The
    # axon tunnel hangs on donated executables — see donation_supported.
    step_fn = make_train_step(model, objective, donate=donation_supported())
    mesh = parallel.mesh_for_batch(args.batch_size)
    if mesh is not None:
        # Commit params/opt state to the global mesh before the jitted step
        # sees a global batch: under jax.process_count()>1 locally-committed
        # state + a global array is an incompatible-devices error. Uses the
        # process-local assembly path — a plain device_put would need a
        # cross-host transfer for host-restored (resume) leaves.
        state = parallel.replicate_to_mesh(state, mesh)
    run_name = args.run_name or args.experiment or args.preset
    logger = MetricLogger(args.logdir, run_name)
    loaded_history = (
        load_loss_history(args.load) if args.load and not args.retrain else None
    )
    if loaded_history:
        logger.loss_history = loaded_history

    # Prediction-grid logging (train.py:915-956): forward the current batch
    # and render argmax colormap grids under the reference tag names.
    forward = jax.jit(
        lambda params, batch_stats, images: model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            mutable=["batch_stats"],
        )[0]
    )

    def image_fn(i, st, batch):
        outs = forward(st.params, st.batch_stats, batch["image"])
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        logger.log_images(
            int(st.step),
            # Refiner batches carry concat[heatmaps, image]; grid the image.
            np.asarray(batch["image"][..., -3:], np.float32),
            [np.asarray(o, np.float32) for o in outs],
        )

    steps_per_epoch = len(loader)

    # Per-STEP loss record (the reference saves record arrays every
    # iteration inside the checkpoint, try_with_aspp.py:359-421) —
    # accumulated on device, read back once per save. Fine-tune restarts at
    # epoch 0 (a donor's curve is not this run's), and a resume only seeds
    # the trace when the loaded history really is a per-step record of the
    # resumed steps — otherwise the trace disables itself and the
    # log-cadence logger history is saved instead (the pre-trace behavior).
    trace = DeviceLossTrace(steps_per_epoch * args.epochs)
    if loaded_history and not args.fine_tune:
        trace.prefill(loaded_history, steps_per_epoch * int(state.epoch))

    def log_fn(i, m):
        step = i + steps_per_epoch * epoch
        logger.log_scalars(step, {k: v for k, v in m.items() if k != "finite"})
        logger.print_progress(epoch, args.epochs, i, steps_per_epoch, m["loss"])

    key = jax.random.PRNGKey(args.seed + 1)
    start_epoch = int(state.epoch)
    for epoch in range(start_epoch, args.epochs):
        state, _, key = fit_epoch(
            step_fn,
            state,
            loader,
            mesh=mesh,
            log_every=args.log_every,
            log_fn=log_fn,
            render_fn=render_fn,
            key=key,
            image_every=args.image_every if args.logdir else 0,
            image_fn=image_fn,
            step_offset=steps_per_epoch * epoch,
            trace_fn=trace.record,
        )
        if args.save and ((epoch + 1) % args.save_every == 0
                          or epoch + 1 == args.epochs):
            save_checkpoint(args.save, state,
                            loss_history=trace.history() or logger.loss_history,
                            async_save=args.async_save)
    if args.save:
        wait_for_checkpoints()
        final = trace.history()
        if final:
            logger.loss_history = {k: list(v) for k, v in final.items()}
        if jax.process_index() == 0:  # plain file write — don't race hosts
            logger.save_loss_curve(args.save.rstrip("/") + "_loss.png")
    logger.close()
    return state


if __name__ == "__main__":
    main()
