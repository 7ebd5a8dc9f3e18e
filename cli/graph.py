"""Model structure dump — replaces the reference's torchviz/plot_model graph
artifacts (/root/reference/model_draw.py:338-344, model.py:235): prints a
flax tabulate summary (module tree, shapes, params, FLOPs) and can dump the
optimized HLO text for compiler-level inspection."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from .common import add_model_args, build_model_from_args, resolve_experiment


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--hlo-out", default=None,
                   help="write optimized HLO text to this path")
    p.add_argument("--depth", type=int, default=2, help="tabulate depth")
    args = p.parse_args(argv)
    resolve_experiment(args)
    return args


def main(argv=None):
    args = parse_args(argv)
    from flax import linen as nn

    model = build_model_from_args(args, use_running_average=True)
    x = jnp.zeros((1, args.input_size, args.input_size, 3),
                  jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    print(
        nn.tabulate(
            model, jax.random.PRNGKey(0), depth=args.depth,
            compute_flops=False, compute_vjp_flops=False,
        )(x)
    )
    if args.hlo_out:
        variables = model.init(jax.random.PRNGKey(0), x)
        txt = (
            jax.jit(lambda v, xx: model.apply(v, xx))
            .lower(variables, x)
            .compile()
            .as_text()
        )
        with open(args.hlo_out, "w") as f:
            f.write(txt)
        print(f"optimized HLO written to {args.hlo_out} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
