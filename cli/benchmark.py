"""Latency/throughput CLI — replaces the reference's manual timing loop
(/root/reference/hourglass_compare.py:1263-1273: 100 forwards, min/mean of
time.process_time) with tunnel-safe on-device measurement."""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from .common import add_model_args, build_model_from_args, resolve_experiment


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--latency", action="store_true",
                   help="also report bs=1 latency (reference's 100-run loop)")
    p.add_argument("--train", action="store_true",
                   help="measure the full training step (fwd+bwd+Adam) instead "
                        "of inference")
    p.add_argument("--int8", action="store_true",
                   help="run inference through the fused-Pallas int8 path "
                        "(static calibration on the bench batch; different "
                        "numerics from bf16 — see BASELINE.md 'int8 ceiling')")
    p.add_argument("--fold", action="store_true",
                   help="inference-only tail fold (StackedHourglass + "
                        "ProgressiveHourglass presets): collapse each "
                        "non-final stack's head/merge/return convs into one "
                        "matmul (exact math on the final output; see "
                        "models/recursive.py fold_tail)")
    p.add_argument("--json", action="store_true", help="print one JSON line")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace (xplane, for TensorBoard "
                        "or xprof) of the timed region to this directory. "
                        "NOTE: requires a locally attached TPU; remote-tunnel "
                        "attachments time dispatch, not device compute")
    args = p.parse_args(argv)
    if args.fold and (args.train or args.int8):
        p.error("--fold measures the folded bf16 inference graph; it cannot "
                "be combined with --train or --int8")
    if args.train and args.int8:
        p.error("--train and --int8 are mutually exclusive modes")
    resolve_experiment(args)
    return args


def main(argv=None):
    args = parse_args(argv)

    from progressive_process_for_human_pose_estimation_tpu.bench import (
        measure_latency,
        measure_throughput,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.input_size, args.input_size, 3), dtype
    )

    if args.train:
        import numpy as np
        import optax

        from progressive_process_for_human_pose_estimation_tpu.losses import (
            ce_loss,
        )
        from progressive_process_for_human_pose_estimation_tpu.train import (
            create_train_state,
        )

        model = build_model_from_args(args)  # train mode (batch stats update)
        state = create_train_state(model, jax.random.PRNGKey(0), x)
        map_size = args.input_size // 4
        rng = np.random.default_rng(0)

        def step_fn(xx):
            # CE of every stack vs a fixed target: representative fwd+bwd+Adam.
            target = jnp.zeros((args.batch, map_size, map_size), jnp.int32)

            def loss_fn(params, batch_stats):
                outs, upd = model.apply(
                    {"params": params, "batch_stats": batch_stats}, xx,
                    mutable=["batch_stats"],
                )
                if not isinstance(outs, (list, tuple)):
                    outs = [outs]
                return sum(ce_loss(o, target) for o in outs), upd

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats
            )
            updates, _ = state.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            # Reduce over EVERY updated parameter: returning a single leaf
            # lets XLA dead-code-eliminate the other parameters' gradients
            # and report a fictitious throughput (round-1's 425.8 img/s was
            # exactly this artifact).
            return jax.tree.reduce(
                lambda acc, p: acc + jnp.sum(p.astype(jnp.float32)),
                new_params,
                jnp.float32(0),
            ) + loss

        apply_fn = step_fn
    elif args.int8:
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_fused import (
            build_int8_pallas_apply,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
            calibrate,
        )

        model = build_model_from_args(args, use_running_average=True)
        variables = model.init(jax.random.PRNGKey(0), x)
        scales = calibrate(model, variables, x)
        apply_fn = build_int8_pallas_apply(model, variables, scales)
    else:
        extra = {"fold_tail": True} if args.fold else {}
        model = build_model_from_args(args, use_running_average=True, **extra)
        variables = model.init(jax.random.PRNGKey(0), x)
        apply_fn = lambda xx: model.apply(variables, xx)

    if args.profile_dir:
        # SURVEY.md §5: first-class tracing. One traced warm iteration after
        # compile; the throughput numbers below stay untraced.
        compiled = jax.jit(apply_fn)
        compiled(x)
        with jax.profiler.trace(args.profile_dir):
            jax.block_until_ready(compiled(x))

    ips, dt = measure_throughput(apply_fn, x)
    out = {
        "preset": args.preset,
        "batch": args.batch,
        "images_per_sec": round(ips, 1),
        "sec_per_batch": round(dt, 6),
    }
    if args.latency and not args.train:
        x1 = x[:1]
        lat_min, lat_mean = measure_latency(lambda xx: model.apply(variables, xx), x1)
        out["latency_bs1_min_ms"] = round(lat_min * 1e3, 3)
        out["latency_bs1_mean_ms"] = round(lat_mean * 1e3, 3)
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main()
