"""int8 inference path for the recursive StackedHourglass family.

The bf16 headline runs at 76-80% of the chip's measured bf16 peak
(BASELINE.md "Roofline"), so the only remaining large speedup is lower
precision: the MXU runs s8 x s8 -> s32 at ~316 TOPS on this chip (measured,
`/tmp`-probe recorded in ROUND2_NOTES) vs 191.5 TFLOPs bf16. This module
quantizes the BN-folded fast-inference path (fast_infer.py) post-training:

- **weights**: per-output-channel symmetric int8 (scale = amax/127), folded
  BN included, so the int8 matmul result times ``(act_scale * w_scale[c])``
  reproduces the bf16 product;
- **activations**: per-tensor symmetric int8 with STATIC scales calibrated
  by one forward pass of the bf16 path on a calibration batch (amax
  recording — :func:`calibrate`); dynamic (per-batch) quantization would
  cost an extra full-tensor reduction per conv.

Only the conv contractions run int8; BN affines, ReLUs, residual adds, the
heads, and the resizes stay bf16/fp32, so the numerics drift is bounded per
block (measured: see tests/test_int8.py tolerances and the ROUND2_NOTES
accuracy check). This is an OPT-IN mode (`bench.py --int8`,
``build_int8_apply``) — the reference's own low-precision analogue is fp16
inference (/root/reference/train.py:991 ``.half()``); int8 is the
TPU-native continuation of that tradeoff.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.resize import max_pool_2x2, upsample2x_bilinear_align_corners
from .fast_infer import _fold_conv_bn
from .fused_residual import fold_lite_residual_params


def _quant_w(w):
    """Per-output-channel symmetric int8. w: (..., C_out) bf16/fp32."""
    w = w.astype(jnp.float32)
    red = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w), axis=red) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _quant_x(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )


def _mm_i8(xq, wq):
    """(N..., K)int8 @ (K, C)int8 -> int32 on the MXU."""
    return jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _conv3x3_i8(xq, wq):
    return jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quantize_lite_residual(fp: Dict) -> Dict:
    """Quantize a BN-folded residual block's weights (keeps fp biases)."""
    q = {"a0": fp["a0"], "b0": fp["b0"]}
    for name in ("w1", "w3") + (("w4",) if "w4" in fp else ()):
        wq, s = _quant_w(fp[name])
        q[name], q[name + "_s"] = wq, s
    wq, s = _quant_w(fp["w2"])  # (3,3,M,M), per-out-channel
    q["w2"], q["w2_s"] = wq, s
    for name in ("b1", "b2", "b3") + (("b4",) if "b4" in fp else ()):
        q[name] = fp[name].astype(jnp.float32)
    return q


def int8_lite_residual(x, q: Dict, act_scales: Dict):
    """int8 version of fused_residual.lite_residual_fast.

    ``act_scales``: {'y','h1','h2','x'} per-tensor static scales for the
    quantized conv inputs (x only used by projection blocks).
    """
    dt = x.dtype
    y = jnp.maximum(x * q["a0"] + q["b0"], 0)
    yq = _quant_x(y, act_scales["y"])
    h1 = _mm_i8(yq, q["w1"]).astype(jnp.float32) * (act_scales["y"] * q["w1_s"])
    h1 = jnp.maximum(h1 + q["b1"], 0)
    h1q = _quant_x(h1, act_scales["h1"])
    h2 = _conv3x3_i8(h1q, q["w2"]).astype(jnp.float32) * (
        act_scales["h1"] * q["w2_s"]
    )
    h2 = jnp.maximum(h2 + q["b2"], 0)
    h2q = _quant_x(h2, act_scales["h2"])
    out = _mm_i8(h2q, q["w3"]).astype(jnp.float32) * (
        act_scales["h2"] * q["w3_s"]
    ) + q["b3"]
    if "w4" in q:
        xq = _quant_x(x, act_scales["x"])
        skip = _mm_i8(xq, q["w4"]).astype(jnp.float32) * (
            act_scales["x"] * q["w4_s"]
        ) + q["b4"]
    else:
        skip = x.astype(jnp.float32)
    return (out + skip).astype(dt)


def _amax_lite_residual(x, fp: Dict, record: List[float]):
    """bf16 forward of the folded block that records conv-input amaxes in
    calibration order (y, h1, h2[, x]) — must mirror int8_lite_residual."""
    from .fused_residual import _conv1x1

    y = jnp.maximum(x * fp["a0"] + fp["b0"], 0)
    record.append(jnp.max(jnp.abs(y.astype(jnp.float32))))
    h1 = jnp.maximum(_conv1x1(y, fp["w1"]) + fp["b1"], 0)
    record.append(jnp.max(jnp.abs(h1.astype(jnp.float32))))
    h2 = jnp.maximum(
        jax.lax.conv_general_dilated(
            h1, fp["w2"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + fp["b2"],
        0,
    )
    record.append(jnp.max(jnp.abs(h2.astype(jnp.float32))))
    out = _conv1x1(h2, fp["w3"]) + fp["b3"]
    if "w4" in fp:
        record.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        skip = _conv1x1(x, fp["w4"]) + fp["b4"]
    else:
        skip = x
    return out + skip


def _plan(model, variables, dtype=jnp.bfloat16):
    """Shared structure between calibration and the int8 forward: folded
    params for stem/hourglass blocks + head/lin/return weights."""
    from ..models.recursive import COCO_SKELETON

    p, s = variables["params"], variables["batch_stats"]
    fp_res = {
        n: fold_lite_residual_params(p[n], s[n], dtype)
        for n in ("residual1", "residual2", "residual3", "residual4")
    }
    fp_hg = {
        n: fold_lite_residual_params(
            p["hourglass1"][f"residual_block_n{n}"],
            s["hourglass1"][f"residual_block_n{n}"],
            dtype,
        )
        for n in range(1, model.hourglass_depth + 1)
    }
    lin_w, lin_b = _fold_conv_bn(
        p["lin"]["conv"]["conv"], p["lin"]["bn"]["bn"], s["lin"]["bn"]["bn"], dtype
    )
    heads = {
        "lin": (lin_w, lin_b),
        "head": (p["conv2"]["conv"]["kernel"].astype(dtype)[0, 0],
                 p["conv2"]["conv"]["bias"].astype(dtype)),
        "ret_ll": (p["conv3"]["conv"]["kernel"].astype(dtype)[0, 0],
                   p["conv3"]["conv"]["bias"].astype(dtype)),
        "ret_out": (p["conv4"]["conv"]["kernel"].astype(dtype)[0, 0],
                    p["conv4"]["conv"]["bias"].astype(dtype)),
    }
    sks = model.skeleton if model.skeleton is not None else COCO_SKELETON
    stem_w = p["conv1"]["conv"]["kernel"].astype(dtype)
    stem_b = p["conv1"]["conv"]["bias"].astype(dtype)
    return fp_res, fp_hg, heads, sks, stem_w, stem_b


def _forward(model, plan, x, block_fn):
    """The weight-shared recursive forward, parameterized over how a folded
    residual block is executed (bf16-amax-recording or int8). ``block_fn``
    is called with a unique per-call-site key so static activation scales
    can differ between call sites that share weights."""
    from .fast_infer import _matmul1x1

    import numpy as np

    fp_res, fp_hg, heads, sks, stem_w, stem_b = plan
    depth, n_modules, n_stack = (
        model.hourglass_depth, model.n_modules, model.n_stack,
    )
    merge_m = None
    if model.variant == "skeleton_merge":
        # Same constant-matrix contraction as models.recursive (measured
        # faster than channel gathers — HBM traffic).
        c = model.out_channels
        base = c - len(sks)
        mm = np.zeros((c, c), np.float32)
        mm[np.arange(c), np.arange(c)] = 1.0
        for e, (j0, j1) in enumerate(sks):
            mm[0, base + e] -= 1.0
            mm[j0, base + e] += 1.0
            mm[j1, base + e] += 1.0
        merge_m = jnp.asarray(mm, jnp.bfloat16)

    def apply_mods(h, n, site):
        for k in range(n_modules):
            h = block_fn(h, fp_hg[n], f"{site}/hg{n}m{k}")
        return h

    def hourglass(h, n, site):
        up1 = apply_mods(h, n, site + "/up1")
        low1 = apply_mods(max_pool_2x2(h), n, site + "/low1")
        low2 = (hourglass(low1, n - 1, site) if n > 1
                else apply_mods(low1, n, site + "/low2"))
        low3 = apply_mods(low2, n, site + "/low3")
        return up1 + upsample2x_bilinear_align_corners(low3)

    x = x.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, stem_w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + stem_b
    y = jnp.maximum(y, 0)
    y = block_fn(y, fp_res["residual1"], "r1")
    y = max_pool_2x2(y)
    y = block_fn(y, fp_res["residual2"], "r2")
    inter = block_fn(y, fp_res["residual3"], "r3")

    outs = []
    for i in range(n_stack):
        ll = hourglass(inter, depth, f"s{i}")
        for k in range(n_modules):
            ll = block_fn(ll, fp_res["residual4"], f"s{i}/r4m{k}")
        ll = jnp.maximum(_matmul1x1(ll, *heads["lin"]), 0)
        head_out = _matmul1x1(ll, *heads["head"])

        if model.variant == "skeleton_merge":
            stack_out = jax.lax.dot_general(
                head_out, merge_m.astype(head_out.dtype),
                (((3,), (0,)), ((), ())),
            )
            return_feed = stack_out
        elif model.variant == "plain":
            stack_out = return_feed = head_out
        else:
            raise NotImplementedError(model.variant)
        outs.append(stack_out)
        if i < n_stack - 1:
            inter = _matmul1x1(ll, *heads["ret_ll"]) + _matmul1x1(
                return_feed, *heads["ret_out"]
            )
    return outs


def calibrate(model, variables, x_cal) -> Dict[str, Dict[str, float]]:
    """One bf16 pass recording per-call-site conv-input amaxes → scales."""
    plan = _plan(model, variables)
    sites: Dict[str, List] = {}

    def record_block(h, fp, site):
        rec: List = []
        out = _amax_lite_residual(h, fp, rec)
        sites[site] = rec
        return out

    _forward(model, plan, x_cal, record_block)
    names = ("y", "h1", "h2", "x")
    # Floor mirrors _quant_w's 1e-12 weight guard: a call site whose
    # activations are all zero on the calibration batch (e.g. a fully-off
    # ReLU) would otherwise yield scale 0.0 and _quant_x divides by it.
    return {
        site: {names[k]: max(float(v), 1e-6) / 127.0 for k, v in enumerate(rec)}
        for site, rec in jax.device_get(sites).items()
    }


def build_int8_apply(model, variables, scales: Dict[str, Dict[str, float]]):
    """`fast(x) -> [stack outputs]`, conv contractions in int8.

    ``scales`` comes from :func:`calibrate` (same model/variables)."""
    assert model.share_weights, "int8 path covers the weight-shared family"
    plan = _plan(model, variables)
    fp_res, fp_hg = plan[0], plan[1]
    q_res = {n: quantize_lite_residual(fp) for n, fp in fp_res.items()}
    q_hg = {n: quantize_lite_residual(fp) for n, fp in fp_hg.items()}

    def int8_block(h, fp, site):
        q = None
        for n, fp_c in fp_res.items():
            if fp_c is fp:
                q = q_res[n]
        for n, fp_c in fp_hg.items():
            if fp_c is fp:
                q = q_hg[n]
        return int8_lite_residual(h, q, scales[site])

    def fast(x):
        return _forward(model, plan, x, int8_block)

    return fast
