"""Single-read batch-norm statistics kernel (VERDICT r4 item 9).

The torch-exact two-pass variance (ops/blocks._TorchBatchNorm: pass 1 mean,
pass 2 mean of squared deviations) costs a second full HBM read of every
activation in batch-stat mode — measured ~16% off the flagship's faithful
try_*-eval throughput (ROUND4_NOTES zoo table: 1,147.8 vs 1,360 img/s).
This kernel produces the SAME statistics with ONE read: per grid tile it
accumulates per-channel sums and shifted squared sums in VMEM, with the
shift c taken from the first tile's own mean — the classic shifted-data
algorithm (Chan et al.): var = E[(x-c)^2] - (mean-c)^2 is catastrophic only
when (mean-c)^2 >> var, and c estimated from real data keeps (mean-c)^2 on
the order of var/tile_size. The failure mode the two-pass form was
introduced for (E[x^2]-E[x]^2 cancelling when var << mean^2, e.g. the ASPP
global-pool branch) is exactly the case where ANY sample is a near-perfect
shift.

Inference-only: statistics come out of a pallas_call with no VJP — use via
ops.blocks.fused_bn_stats() around batch-stat EVAL, never training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bn_stats_fused(x: jax.Array, interpret: bool = False):
    """Per-channel (mean, biased var) of a (..., C) array, fp32, one pass.

    Returns (mean, var) with shape (C,) each.
    """
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    n = flat.shape[0]
    tn = min(1024, n)
    while n % tn:
        tn //= 2
    grid = n // tn
    inv_n = 1.0 / n

    def kernel(x_ref, mean_ref, var_ref, s1_ref, s2_ref, c_ref):
        i = pl.program_id(0)
        xt = x_ref[...].astype(jnp.float32)

        @pl.when(i == 0)
        def _init():
            c_ref[...] = jnp.sum(xt, axis=0, keepdims=True) / tn
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

        shift = c_ref[...]
        s1_ref[...] += jnp.sum(xt, axis=0, keepdims=True)
        d = xt - shift
        s2_ref[...] += jnp.sum(d * d, axis=0, keepdims=True)

        @pl.when(i == grid - 1)
        def _fin():
            mean = s1_ref[...] * inv_n
            var = s2_ref[...] * inv_n - jnp.square(mean - c_ref[...])
            mean_ref[...] = mean
            var_ref[...] = jnp.maximum(var, 0.0)

    mean, var = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        in_specs=[pl.BlockSpec((tn, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(flat)
    return mean[0], var[0]
