"""Fused inference path for the recursive (lite) residual block.

Why: XLA's optimized HLO for one eval-mode ResidualBlockLite at 64x64x256
keeps the 3 convolutions separate from ~12 elementwise fusions (BN affine,
ReLU, adds), each of which is an HBM round trip of the full activation —
measured model MFU ~14% while the bare convs run at 107-188 TFLOPs on this
chip. Two remedies, composed:

1. **BN folding** (:func:`fold_lite_residual_params`): in eval mode BN is an
   affine y = x*a + b; the BNs that FOLLOW a conv (bn2 after conv1, bn3
   after conv2) fold into that conv's weights/bias exactly. Only the
   pre-activation bn1 at the block input remains explicit.
2. **One Pallas kernel per residual** (:func:`lite_residual_pallas`): the
   whole block — bn1 affine + ReLU, 1x1 reduce (a matmul on the MXU), ReLU,
   3x3 conv computed as 9 shifted matmuls from a VMEM halo buffer, ReLU,
   1x1 expand, skip add — runs out of VMEM with a single HBM read of x and
   single write of the output. Grid = batch; weights resident in VMEM.

Reference semantics: /root/reference/only_one_hourgless.py:135-166 (the
residual family of the 8-stack flagship). Equal in/out channels only (the
flagship's hourglass blocks are all f->f); other blocks use the folded-jnp
path.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bn_affine(bn_params, bn_stats, eps: float = 1e-5):
    scale = bn_params["scale"].astype(jnp.float32)
    bias = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    a = scale / jnp.sqrt(var + eps)
    b = bias - mean * a
    return a, b


def fold_lite_residual_params(params: Dict, stats: Dict, dtype=jnp.bfloat16) -> Dict:
    """Fold bn2 into conv1 and bn3 into conv2 (eval mode).

    bn(conv(x)) = (x*W + c)*a + b = x*(W*a) + (c*a + b) — per-output-channel.
    Returns dict: a0,b0 (bn1 affine), w1,b1 (folded), w2,b2 (folded 3x3),
    w3,b3 (conv3 as-is), and optionally w4,b4 (projection conv).
    """
    a0, b0 = _bn_affine(params["bn1"]["bn"], stats["bn1"]["bn"])
    a1, b1 = _bn_affine(params["bn2"]["bn"], stats["bn2"]["bn"])
    a2, b2 = _bn_affine(params["bn3"]["bn"], stats["bn3"]["bn"])

    w1 = params["conv1"]["conv"]["kernel"].astype(jnp.float32)  # (1,1,C,M)
    c1 = params["conv1"]["conv"]["bias"].astype(jnp.float32)
    w2 = params["conv2"]["conv"]["kernel"].astype(jnp.float32)  # (3,3,M,M)
    c2 = params["conv2"]["conv"]["bias"].astype(jnp.float32)
    w3 = params["conv3"]["conv"]["kernel"].astype(jnp.float32)  # (1,1,M,C)
    c3 = params["conv3"]["conv"]["bias"].astype(jnp.float32)

    out = {
        "a0": a0.astype(dtype),
        "b0": b0.astype(dtype),
        "w1": (w1[0, 0] * a1[None, :]).astype(dtype),          # (C, M)
        "b1": (c1 * a1 + b1).astype(dtype),
        "w2": (w2 * a2[None, None, None, :]).astype(dtype),     # (3,3,M,M)
        "b2": (c2 * a2 + b2).astype(dtype),
        "w3": w3[0, 0].astype(dtype),                           # (M, C)
        "b3": c3.astype(dtype),
    }
    if "conv4" in params:
        out["w4"] = params["conv4"]["conv"]["kernel"][0, 0].astype(dtype)
        out["b4"] = params["conv4"]["conv"]["bias"].astype(dtype)
    return out


def _conv1x1(x, w):
    """1x1 conv via conv_general_dilated — XLA's conv path fuses surrounding
    elementwise ops better than an equivalent dot_general here."""
    return jax.lax.conv_general_dilated(
        x, w[None, None], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def lite_residual_fast(x: jax.Array, fp: Dict) -> jax.Array:
    """Folded-weight jnp path (any channel combination)."""
    y = jnp.maximum(x * fp["a0"] + fp["b0"], 0)
    h = jnp.maximum(_conv1x1(y, fp["w1"]) + fp["b1"], 0)
    h = jnp.maximum(
        jax.lax.conv_general_dilated(
            h, fp["w2"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + fp["b2"],
        0,
    )
    out = _conv1x1(h, fp["w3"]) + fp["b3"]
    residual = _conv1x1(x, fp["w4"]) + fp["b4"] if "w4" in fp else x
    return out + residual


def lite_residual_hybrid(x: jax.Array, fp: Dict) -> jax.Array:
    """Pallas fused kernel at small spatial sizes (where it measured 3x
    faster than XLA), XLA convs at large (where XLA's own fusion wins)."""
    if "w4" not in fp and x.shape[1] <= 16 and x.shape[1] >= 8:
        return lite_residual_pallas(x, fp)
    return lite_residual_fast(x, fp)


def lite_residual_pallas(x: jax.Array, fp: Dict) -> jax.Array:
    """Fused residual for equal in/out channels. x: (B, H, W, C) bf16.

    One grid program per batch element; the whole (H, W, C) activation and
    all weights live in VMEM. The 3x3 conv is computed from a zero-padded
    (H+2, W+2, M) scratch via 9 shifted (H*W, M) x (M, M) MXU matmuls
    accumulated in fp32.
    """
    b, h, w, c = x.shape
    m = fp["w1"].shape[1]
    assert fp["w3"].shape[1] == c and "w4" not in fp, "equal-channel blocks only"

    # Row-chunked processing keeps fp32 intermediates small: only the padded
    # mid activations (hpad) persist at full spatial extent in VMEM.
    chunk = min(16, h)
    n_chunks = h // chunk

    def kernel(x_ref, a0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               w3_ref, b3_ref, out_ref, hpad_ref):
        # Phase 1: bn1 + ReLU + 1x1 reduce, written into the padded buffer.
        hpad_ref[...] = jnp.zeros((h + 2, w + 2, m), x_ref.dtype)
        for r in range(n_chunks):
            xs = x_ref[0, r * chunk : (r + 1) * chunk]
            y = jnp.maximum(xs * a0_ref[...] + b0_ref[...], 0.0)
            h1 = jax.lax.dot_general(
                y.reshape(chunk * w, c), w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h1 = jnp.maximum(h1 + b1_ref[...].astype(jnp.float32), 0.0)
            hpad_ref[1 + r * chunk : 1 + (r + 1) * chunk, 1 : w + 1, :] = (
                h1.astype(x_ref.dtype).reshape(chunk, w, m)
            )

        # Phase 2: 3x3 conv (9 shifted matmuls) + ReLU + 1x1 expand + skip.
        for r in range(n_chunks):
            acc = jnp.zeros((chunk * w, m), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    tap = hpad_ref[
                        r * chunk + dy : (r + 1) * chunk + dy, dx : dx + w, :
                    ].reshape(chunk * w, m)
                    acc += jax.lax.dot_general(
                        tap, w2_ref[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            h2 = jnp.maximum(acc + b2_ref[...].astype(jnp.float32), 0.0).astype(
                x_ref.dtype
            )
            out = jax.lax.dot_general(
                h2, w3_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype) + b3_ref[...]
            out_ref[0, r * chunk : (r + 1) * chunk] = (
                out.reshape(chunk, w, c) + x_ref[0, r * chunk : (r + 1) * chunk]
            )

    spec_full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                           memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_full((c,)), spec_full((c,)),
            spec_full((c, m)), spec_full((m,)),
            spec_full((3, 3, m, m)), spec_full((m,)),
            spec_full((m, c)), spec_full((c,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, m), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (c * m + 9 * m * m + m * c),
            bytes_accessed=2 * 2 * b * h * w * c,
            transcendentals=0,
        ),
    )(x, fp["a0"], fp["b0"], fp["w1"], fp["b1"], fp["w2"], fp["b2"],
      fp["w3"], fp["b3"])
