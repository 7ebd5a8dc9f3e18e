"""Fused int8 residual block: quantize → s8×s8→s32 convs → dequant in VMEM.

Round 2 measured why the XLA int8 path loses end-to-end (1,218 vs 1,514
img/s bf16) even though the bare int8 convs run 315-336 TOPS: every
quantize/dequantize boundary is an HBM round trip, and XLA relayouts
between the int8 (32,128) and bf16 (16,128) tilings on each crossing. This
kernel removes both costs: one residual block — bn1 affine + ReLU +
quantize, int8 1×1 reduce, dequant + ReLU + requantize, int8 3×3 (nine
shifted MXU matmuls over an int8 VMEM halo buffer), dequant + ReLU +
requantize, int8 1×1 expand, dequant + skip add — runs out of VMEM with a
single bf16 HBM read of x and a single bf16 write of the output. All
rescaling is folded into per-channel affines computed at quantization time,
so the kernel applies exactly one multiply-add between matmuls:

    a0' = bn_a / s_y                  (input affine lands pre-quantized y)
    s1' = s_y  * w1_s / s_h1          (conv1 dequant + h1 requant, fused)
    s2' = s_h1 * w2_s / s_h2
    s3' = s_h2 * w3_s                 (final dequant only)

Scales come from the same static per-call-site calibration as the XLA path
(int8_infer.calibrate); weights are per-output-channel symmetric int8
(int8_infer._quant_w). Equal in/out channels only (the flagship's hourglass
and residual4 blocks — where all the FLOPs are); stem/projection blocks
stay on the bf16 path, where XLA measured faster anyway (ROUND2_NOTES).

Reference anchor: the reference's low-precision inference is fp16
(`.half()`, /root/reference/train.py:991); int8 is the TPU-native
continuation of that tradeoff, and BASELINE.md "The int8 ceiling" records
the honest throughput ceiling it chases.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int8_infer import _quant_w


def fuse_int8_block_params(fp: Dict, act_scales: Dict) -> Dict:
    """Fold calibration + weight scales into the kernel's affine constants.

    ``fp``: BN-folded bf16 params (fused_residual.fold_lite_residual_params,
    equal-channel block — no w4). ``act_scales``: {'y','h1','h2'} static
    scales from int8_infer.calibrate for this call site.
    """
    assert "w4" not in fp, "int8 Pallas kernel covers equal-channel blocks"
    s_y, s_h1, s_h2 = (
        float(act_scales["y"]), float(act_scales["h1"]), float(act_scales["h2"])
    )
    w1q, w1s = _quant_w(fp["w1"])
    w2q, w2s = _quant_w(fp["w2"])
    w3q, w3s = _quant_w(fp["w3"])
    f32 = jnp.float32
    return {
        "a0": (fp["a0"].astype(f32) / s_y),
        "b0": (fp["b0"].astype(f32) / s_y),
        "w1": w1q,
        "s1": (s_y * w1s / s_h1).astype(f32),
        "b1": (fp["b1"].astype(f32) / s_h1),
        "w2": w2q,
        "s2": (s_h1 * w2s / s_h2).astype(f32),
        "b2": (fp["b2"].astype(f32) / s_h2),
        "w3": w3q,
        "s3": (s_h2 * w3s).astype(f32),
        "b3": fp["b3"].astype(f32),
    }


def _qround(v):
    """Symmetric int8 quantization of an already-scaled fp32 tensor."""
    return jnp.clip(jnp.round(v), -127.0, 127.0).astype(jnp.int8)


def int8_residual_pallas(x: jax.Array, q: Dict, interpret: bool = False) -> jax.Array:
    """x: (B, H, W, C) bf16 → (B, H, W, C); all three convs int8 in VMEM.

    Grid = batch; Pallas pipelines the per-image HBM loads across grid
    steps. The int8 mid activations live in an (H+2, W+2, M) VMEM halo
    buffer — (32, 128) tiling, zero padding is exact for symmetric
    quantization (zero point 0).
    """
    b, h, w, c = x.shape
    m = q["w1"].shape[1]
    chunk = min(16, h)
    if h % chunk != 0:
        chunk = next(k for k in range(chunk, 0, -1) if h % k == 0)
    n_chunks = h // chunk

    def kernel(x_ref, a0_ref, b0_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
               b2_ref, w3_ref, s3_ref, b3_ref, out_ref, hpad_ref):
        # Phase 1: affine+ReLU (pre-scaled by 1/s_y) → int8 → 1×1 reduce →
        # fused dequant/requant affine → int8 halo buffer.
        hpad_ref[...] = jnp.zeros((h + 2, w + 2, m), jnp.int8)
        for r in range(n_chunks):
            xs = x_ref[0, r * chunk : (r + 1) * chunk].astype(jnp.float32)
            y = jnp.maximum(xs * a0_ref[...] + b0_ref[...], 0.0)
            yq = _qround(y).reshape(chunk * w, c)
            h1 = jax.lax.dot_general(
                yq, w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            h1 = jnp.maximum(h1 * s1_ref[...] + b1_ref[...], 0.0)
            hpad_ref[1 + r * chunk : 1 + (r + 1) * chunk, 1 : w + 1, :] = (
                _qround(h1).reshape(chunk, w, m)
            )

        # Phase 2: 3×3 as nine shifted s8 matmuls accumulated in s32 (all
        # taps share the per-output-channel scale, so one dequant at the
        # end), then ReLU/requant, int8 1×1 expand, dequant + skip.
        for r in range(n_chunks):
            acc = jnp.zeros((chunk * w, m), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    tap = hpad_ref[
                        r * chunk + dy : (r + 1) * chunk + dy, dx : dx + w, :
                    ].reshape(chunk * w, m)
                    acc += jax.lax.dot_general(
                        tap, w2_ref[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            h2 = jnp.maximum(
                acc.astype(jnp.float32) * s2_ref[...] + b2_ref[...], 0.0
            )
            out = jax.lax.dot_general(
                _qround(h2), w3_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * s3_ref[...] + b3_ref[...]
            skip = x_ref[0, r * chunk : (r + 1) * chunk].astype(jnp.float32)
            out_ref[0, r * chunk : (r + 1) * chunk] = (
                out.reshape(chunk, w, c) + skip
            ).astype(out_ref.dtype)

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
            spec_full((c, m)), spec_full((m,)), spec_full((m,)),
            spec_full((3, 3, m, m)), spec_full((m,)), spec_full((m,)),
            spec_full((m, c)), spec_full((c,)), spec_full((c,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, m), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (c * m + 9 * m * m + m * c),
            bytes_accessed=2 * 2 * b * h * w * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q["a0"], q["b0"], q["w1"], q["s1"], q["b1"], q["w2"], q["s2"],
      q["b2"], q["w3"], q["s3"], q["b3"])


def build_int8_pallas_apply(model, variables, scales: Dict[str, Dict[str, float]],
                            min_hw: int = 8, max_hw: int = 64,
                            interpret: bool = False):
    """`fast(x) -> [stack outputs]`: fused-Pallas int8 for every
    equal-channel residual call site in [min_hw, max_hw]², bf16 folded math
    elsewhere (stem/projection blocks, where XLA bf16 measured fastest).

    ``scales`` comes from int8_infer.calibrate (same model/variables); the
    per-call-site fused constants are precomputed here so trace time stays
    flat across the 227 call sites.
    """
    from .fused_residual import lite_residual_fast
    from .int8_infer import _plan, _forward

    assert model.share_weights, "int8 path covers the weight-shared family"
    plan = _plan(model, variables)
    fp_res, fp_hg = plan[0], plan[1]

    def fp_for_site(site: str):
        """Map a call-site name (int8_infer._forward's naming) back to its
        folded weight block."""
        tail = site.rsplit("/", 1)[-1]
        if tail.startswith("hg"):
            return fp_hg[int(tail[2:].split("m")[0])]
        if tail.startswith("r4m"):
            return fp_res["residual4"]
        return fp_res.get(
            {"r1": "residual1", "r2": "residual2", "r3": "residual3"}.get(site, "")
        )

    # Precompute every call site's fused constants EAGERLY (outside any jit
    # trace): computing them lazily during the first trace would cache
    # tracers, which poison any later trace of the returned function.
    fused: Dict[str, Dict] = {}
    for site, sc in scales.items():
        fp = fp_for_site(site)
        if fp is not None and "w4" not in fp:
            fused[site] = jax.device_get(fuse_int8_block_params(fp, sc))
            fused[site] = {k: jnp.asarray(v) for k, v in fused[site].items()}

    def block_fn(hh, fp, site):
        eligible = (
            site in fused
            and hh.shape[1] == hh.shape[2]
            and min_hw <= hh.shape[1] <= max_hw
        )
        if not eligible:
            return lite_residual_fast(hh, fp)
        return int8_residual_pallas(hh, fused[site], interpret=interpret)

    def fast(x):
        return _forward(model, plan, x, block_fn)

    return fast
