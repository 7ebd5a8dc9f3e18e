"""Params/FLOPs CLI — replaces /root/reference/calculate_parameters.py
(torchstat.stat at lines 1153-1156 and the per-parameter dump at 1167-1168)
with pytree sums and XLA cost analysis."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from .common import add_model_args, build_model_from_args, resolve_experiment


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dump-params", action="store_true",
                   help="per-parameter table (name, shape, size)")
    args = p.parse_args(argv)
    resolve_experiment(args)
    return args


def main(argv=None):
    args = parse_args(argv)

    from progressive_process_for_human_pose_estimation_tpu.bench import (
        count_flops,
        count_params,
        param_table,
    )

    model = build_model_from_args(args, use_running_average=True)
    x = jnp.zeros((args.batch, args.input_size, args.input_size, 3),
                  jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    n_params = count_params(variables["params"])
    print(f"preset: {args.preset}")
    print(f"params: {n_params:,} ({n_params / 1e6:.2f}M)")

    cost = count_flops(lambda v, xx: model.apply(v, xx), variables, x)
    if cost["flops"] >= 0:
        print(f"flops/forward (batch {args.batch}): {cost['flops'] / 1e9:.2f} GFLOP")
        print(f"bytes accessed: {cost['bytes_accessed'] / 1e6:.1f} MB")

    if args.dump_params:
        for name, shape, size in param_table(variables["params"]):
            print(f"{name:80s} {str(shape):>20s} {size:>12,}")
    return n_params, cost


if __name__ == "__main__":
    main()
