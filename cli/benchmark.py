"""Latency/throughput CLI — replaces the reference's manual timing loop
(/root/reference/hourglass_compare.py:1263-1273: 100 forwards, min/mean of
time.process_time) with tunnel-safe on-device measurement."""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from .common import (
    add_eval_bn_arg,
    add_model_args,
    build_eval_model_from_args,
    build_model_from_args,
    resolve_experiment,
)


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
    p.add_argument("--experiment", default=None,
                   help="config.EXPERIMENTS preset (explicit flags override); "
                        "also resolves the faithful --eval-bn mode")
    add_eval_bn_arg(p)
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
    # --train/--int8/--fold keep their historical running-stat graphs. When
    # 'batch' was REQUESTED (explicit flag or --experiment) the conflict is
    # a loud error; when it was merely inferred from the preset's EXPERIMENTS
    # entries, the requested graph wins and the mode falls back quietly (so
    # e.g. `--preset hourglass8_skeleton --fold` keeps benchmarking the
    # folded serving graph).
    requested = args.eval_bn is not None or args.experiment is not None
    resolve_experiment(args)
    if args.eval_bn == "batch" and (args.fold or args.int8 or args.train):
        if args.train or not requested:
            args.eval_bn = "running"  # train mode measures batch stats anyway
        else:
            p.error("--eval-bn batch measures the plain batch-stat inference "
                    "graph; it cannot be combined with --fold/--int8 "
                    "(pass --eval-bn running)")
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
        from progressive_process_for_human_pose_estimation_tpu.bench.timing import (
            measure_train_throughput,
        )

        # The DCE-proof harness (full TrainState carried through the timing
        # loop: fwd + bwd + Adam + BN-stat updates all stay live). An earlier
        # inline step here dropped the batch_stats update, so XLA silently
        # eliminated the BN EMA work from the measurement.
        model = build_model_from_args(args)  # train mode (batch stats update)
        ips, dt = measure_train_throughput(
            model, batch=args.batch, size=args.input_size
        )
        out = {
            "preset": args.preset,
            "batch": args.batch,
            "images_per_sec": round(ips, 1),
            "sec_per_step": round(dt, 6),
            "mode": "train (fwd+bwd+Adam+BN stats)",
        }
        if args.json:
            print(json.dumps(out))
        else:
            for k, v in out.items():
                print(f"{k}: {v}")
        return out

    if args.int8:
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
        # --eval-bn batch: the try_* scripts' test-time mode (BN on current
        # batch statistics, EMA updates discarded) — measures what their
        # faithful eval actually costs vs the running-stat serving graph.
        model, raw_apply, _ = build_eval_model_from_args(args, fold=args.fold)
        variables = model.init(jax.random.PRNGKey(0), x)
        apply_fn = lambda xx: raw_apply(variables, xx)

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
    if args.latency:
        # Measure the SAME executable the throughput number came from
        # (apply_fn covers the plain / --fold / --int8 paths).
        x1 = x[:1]
        lat_min, lat_mean = measure_latency(apply_fn, x1)
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
