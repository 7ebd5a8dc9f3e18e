"""ONE Pallas kernel for the whole ≤16² hourglass subtree (VERDICT r4 8b).

The recursive flagship hourglass (ops/hourglass.RecursiveHourglass, depth 4
from a 64² map) spends its two innermost levels at 16²/8²/4² where every
XLA op is latency/dispatch-bound, not FLOP-bound (the backward-budget table
shows res_pair_8x8 at 4.3x and res_pair_4x4 at 13x the compute roofline;
the per-block Pallas hybrid recovered the isolated milliseconds but LOST
end-to-end at 920 img/s because each small kernel still pays a dispatch and
breaks XLA's surrounding fusions). This kernel runs the ENTIRE n=2 subtree
— in reference terms, the innermost two nestings of only_one_hourgless.py's
``hourglass`` (only_one_hourgless.py:168-196): per level ``n_modules``
weight-shared residuals on the skip, pooled, and decode branches, maxpool
2x2 down, bilinear align_corners x2 up, additive merge — as one program per
batch element with every activation and both levels' folded weights
resident in VMEM: one HBM read of the 16² input, one HBM write of the 16²
output, zero intermediate round trips, one dispatch for 14 residual
applications.

Eval-mode only (BN folded by fused_residual.fold_lite_residual_params);
equal-channel blocks (the hourglass interior is all f->f). The bilinear
upsample is expressed as two small matmuls with precomputed align-corners
weight matrices (U[o, i] = interpolation weight of input row i at output
row o), mathematically identical to ops/resize.upsample2x_bilinear_align_
corners.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align_corners_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) bilinear align-corners interpolation weights."""
    u = np.zeros((out_size, in_size), np.float32)
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        src = o * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w_hi = src - lo
        u[o, lo] += 1.0 - w_hi
        u[o, hi] += w_hi
    return u


def subtree16_pallas(x: jax.Array, fp2: dict, fp1: dict,
                     n_modules: int = 2, interpret: bool = False) -> jax.Array:
    """The n=2 recursive-hourglass subtree on a (B, 16, 16, C) input.

    ``fp2``/``fp1`` are the folded params (fused_residual.fold_lite_
    residual_params) of the level-2 and level-1 shared residual blocks
    (``residual_block_n2`` / ``residual_block_n1``).
    """
    b, h0, w0, c = x.shape
    assert h0 == w0 == 16, (h0, w0)
    m = fp2["w1"].shape[1]
    assert fp2["w3"].shape[1] == c and fp1["w3"].shape[1] == c
    dt = x.dtype

    u84 = jnp.asarray(_align_corners_matrix(8, 4), dt)
    u168 = jnp.asarray(_align_corners_matrix(16, 8), dt)

    def kernel(x_ref,
               a0_2, b0_2, w1_2, b1_2, w2_2, b2_2, w3_2, b3_2,
               a0_1, b0_1, w1_1, b1_1, w2_1, b2_1, w3_1, b3_1,
               u84_ref, u168_ref, out_ref):

        def res(v, a0, b0, w1, b1, w2, b2, w3, b3):
            """One folded residual on a (H, W, C) VMEM value."""
            hh, ww, _ = v.shape
            y = jnp.maximum(v * a0[...] + b0[...], 0.0)
            h1 = jax.lax.dot_general(
                y.reshape(hh * ww, c), w1[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h1 = jnp.maximum(h1 + b1[...].astype(jnp.float32), 0.0).astype(dt)
            h1 = h1.reshape(hh, ww, m)
            # zero-pad to (H+2, W+2, M) as a value; 9 shifted MXU matmuls
            zrow = jnp.zeros((1, ww + 2, m), dt)
            zcol = jnp.zeros((hh, 1, m), dt)
            hp = jnp.concatenate(
                [zrow,
                 jnp.concatenate([zcol, h1, zcol], axis=1),
                 zrow], axis=0)
            acc = jnp.zeros((hh * ww, m), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    tap = hp[dy:dy + hh, dx:dx + ww, :].reshape(hh * ww, m)
                    acc += jax.lax.dot_general(
                        tap, w2[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            h2 = jnp.maximum(acc + b2[...].astype(jnp.float32), 0.0).astype(dt)
            out = jax.lax.dot_general(
                h2, w3[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt) + b3[...]
            return out.reshape(hh, ww, c) + v

        def mods2(v):
            for _ in range(n_modules):
                v = res(v, a0_2, b0_2, w1_2, b1_2, w2_2, b2_2, w3_2, b3_2)
            return v

        def mods1(v):
            for _ in range(n_modules):
                v = res(v, a0_1, b0_1, w1_1, b1_1, w2_1, b2_1, w3_1, b3_1)
            return v

        def pool(v):
            # reshape+reduce instead of strided slices: Mosaic lowers 3-D
            # strided slicing to a (unsupported >2D) gather.
            hh, ww, cc = v.shape
            rows = jnp.max(v.reshape(hh // 2, 2, ww, cc), axis=1)
            return jnp.max(rows.reshape(hh // 2, ww // 2, 2, cc), axis=2)

        def upsample(v, u_ref):
            """(H, W, C) -> (2H, 2W, C) bilinear align-corners via matmuls."""
            hh, ww, _ = v.shape
            u = u_ref[...]
            # rows: contract H -> (2H, W*C)
            yr = jax.lax.dot_general(
                u, v.reshape(hh, ww * c), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt).reshape(2 * hh, ww, c)
            # cols: transpose to (W, 2H*C), contract W, restore layout
            yt = yr.transpose(1, 0, 2).reshape(ww, 2 * hh * c)
            yc = jax.lax.dot_general(
                u, yt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt).reshape(2 * ww, 2 * hh, c)
            return yc.transpose(1, 0, 2)

        v = x_ref[0]                      # (16, 16, C)
        up1 = mods2(v)                    # @16
        low1 = mods2(pool(v))             # @8
        # inner level (n=1)
        iup1 = mods1(low1)                # @8
        ilow1 = mods1(pool(low1))         # @4
        ilow2 = mods1(ilow1)              # @4 (bottleneck 'modules')
        ilow3 = mods1(ilow2)              # @4
        low2 = iup1 + upsample(ilow3, u84_ref)   # @8
        low3 = mods2(low2)                # @8
        out_ref[0] = up1 + upsample(low3, u168_ref)

    def spec_full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def block_specs(fp):
        return [
            spec_full((c,)), spec_full((c,)),
            spec_full((c, m)), spec_full((m,)),
            spec_full((3, 3, m, m)), spec_full((m,)),
            spec_full((m, c)), spec_full((c,)),
        ]

    def block_args(fp):
        return [fp["a0"], fp["b0"], fp["w1"], fp["b1"], fp["w2"], fp["b2"],
                fp["w3"], fp["b3"]]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=(
            [pl.BlockSpec((1, h0, w0, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)]
            + block_specs(fp2) + block_specs(fp1)
            + [spec_full((8, 4)), spec_full((16, 8))]
        ),
        out_specs=pl.BlockSpec((1, h0, w0, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *block_args(fp2), *block_args(fp1), u84, u168)
