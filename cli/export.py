"""Model export for serving — serialize a compiled inference function.

The reference has no deployment story (its ``mode='test'`` branches re-run
the training script; /root/reference/train.py:989-1329). The TPU-native
serving path is ahead-of-time export via ``jax.export``: the jitted forward
(weights baked in as constants, bf16 eval mode, fixed input shape) is
serialized to a portable StableHLO artifact that a serving process restores
with ``jax.export.deserialize(...)`` and calls without Python model code —
``python -m cli.serve_check`` equivalent is the ``--check`` flag here.

Example:
    python -m cli.export --preset progressive_mpii --load ckpts/progressive \
        --batch 8 --out model.jaxexport --check
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    add_eval_bn_arg,
    add_model_args,
    build_eval_model_from_args,
    resolve_experiment,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--load", default=None,
                   help="checkpoint to bake in (default: fresh init)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--fold", action="store_true",
                   help="export with the inference-only tail fold "
                        "(StackedHourglass + ProgressiveHourglass presets): "
                        "non-final stacks' head/merge/return convs collapsed "
                        "into one matmul; the artifact emits only the final "
                        "stage's output (exact same values)")
    p.add_argument("--dynamic-batch", action="store_true",
                   help="export with a symbolic batch dimension (jax.export "
                        "shape polymorphism): one artifact serves any batch "
                        "size; --batch then only sets the --check batch")
    p.add_argument("--check", action="store_true",
                   help="deserialize the artifact and verify it reproduces "
                        "the live model's outputs")
    p.add_argument("--experiment", default=None,
                   help="config.EXPERIMENTS preset (explicit flags override); "
                        "also resolves the faithful --eval-bn mode")
    add_eval_bn_arg(p)
    args = p.parse_args(argv)
    resolve_experiment(args)
    return args


def main(argv=None):
    args = parse_args(argv)
    from jax import export as jax_export

    # In batch-BN mode (the try_* scripts' test behavior) the exported graph
    # computes batch statistics inline and discards the EMA updates, so the
    # artifact stays a pure function of the input batch; --fold requires
    # running stats (the shared builder refuses the combination loudly).
    model, apply_fn, _ = build_eval_model_from_args(args, fold=args.fold)
    shape = (args.batch, args.input_size, args.input_size, 3)
    x0 = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    if args.load:
        from progressive_process_for_human_pose_estimation_tpu.train import (
            create_train_state,
            maybe_resume,
        )

        state = create_train_state(model, jax.random.PRNGKey(0), x0)
        state = maybe_resume(args.load, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    def forward(x):
        return apply_fn(variables, x)

    if args.dynamic_batch:
        # Shape-polymorphic export: the batch dim is the symbol 'b', spatial
        # dims stay concrete (the models' space-to-depth/stride reshapes need
        # them static). The serving process calls the same artifact with any
        # batch size.
        (b,) = jax_export.symbolic_shape("b")
        export_spec = jax.ShapeDtypeStruct((b,) + shape[1:], jnp.float32)
    else:
        export_spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    exp = jax_export.export(jax.jit(forward))(export_spec)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.preset} {shape} -> {args.out} ({len(blob)} bytes, "
          f"platforms={exp.platforms})")

    if args.check:
        with open(args.out, "rb") as f:
            restored = jax_export.deserialize(f.read())
        x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
        # Compare against the JITTED forward — the artifact serializes the
        # compiled graph, and eager-vs-jit rounding differences amplify
        # through deep stacks (measured: 1e-5 at stack 0 grows to 0.14 by
        # stack 8 under batch-stat BN, which renormalizes drifting
        # activations every stack).
        live = jax.jit(forward)(x)
        served = restored.call(x)
        for i, (a, b) in enumerate(zip(live, served)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-2,
            )
        print(f"check ok: {len(live)} outputs match the live model")
    return args.out


if __name__ == "__main__":
    main()
