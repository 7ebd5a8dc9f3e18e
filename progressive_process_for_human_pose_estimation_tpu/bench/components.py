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


def model_throughput(model, variables, x, n_lo: int = 4, n_hi: int = 40):
    """images/sec for ``model.apply`` on input ``x``."""
    dt = time_fn(lambda xx: model.apply(variables, xx), x, n_lo=n_lo, n_hi=n_hi)
    return x.shape[0] / dt, dt
