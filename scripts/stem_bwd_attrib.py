"""Attribute the stem-backward excess (ROUND4_NOTES backward budget table).

The whole-stem fwd+bwd segment measures 2.79 ms vs a 0.50 ms 3x-forward
roofline (5.6x). This script times each stem sub-op's fwd+bwd in isolation
on the chip (same harness as bench/components.flagship_budget) to find
where the excess lives: the space-to-depth 7x7/2 conv, the 128-channel
residuals at 128^2, the maxpool, or the 64^2 residuals.

Run: python scripts/stem_bwd_attrib.py   (real chip)
"""

import sys

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, ".")

from progressive_process_for_human_pose_estimation_tpu.bench.components import (  # noqa: E402
    time_fn,
)
from progressive_process_for_human_pose_estimation_tpu.ops.blocks import (  # noqa: E402
    Conv,
    ResidualBlockLite,
)
from progressive_process_for_human_pose_estimation_tpu.ops.resize import (  # noqa: E402
    max_pool_2x2,
)

PEAK_TFLOPS = 191.5
BATCH = 8


def timed_fb(module, shape, n_lo=32, n_hi=288):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(1), x)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def fb(xx):
        def loss(p, xi):
            out = module.apply(
                {"params": p, "batch_stats": stats}, xi,
                mutable=["batch_stats"])
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out.astype(jnp.float32))

        return jax.value_and_grad(loss, argnums=(0, 1))(params, xx)

    return time_fn(fb, x, n_lo=n_lo, n_hi=n_hi)


def row(name, dt, fwd_flops):
    roof = 3 * fwd_flops / (PEAK_TFLOPS * 1e12) * 1e3
    print(f"{name:28s} {dt*1e3:8.4f} ms   roofline {roof:7.4f} ms   "
          f"x{dt*1e3/roof if roof else float('inf'):6.1f}")


class ConvRelu(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.relu(Conv(64, 7, 2, 3, dtype=jnp.bfloat16)(x))


class PoolOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return max_pool_2x2(x)


bn_kw = dict(use_running_average=False, dtype=jnp.bfloat16)


class Res(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, x):
        return ResidualBlockLite(self.feats, **bn_kw)(x)


def main():
    f = 1e9 * 2 * BATCH  # GFLOP helper: 2*B * (per-image-per-px work)
    # conv7 s2d: 128^2 px * 147 * 64 mults
    dt = timed_fb(ConvRelu(), (BATCH, 256, 256, 3))
    row("conv7x7/2 s2d + relu", dt, 2 * BATCH * 128 * 128 * 147 * 64)

    dt = timed_fb(Res(128), (BATCH, 128, 128, 64))
    row("res 64->128 @128^2", dt,
        2 * BATCH * 128 * 128 * (64 * 64 + 9 * 64 * 64 + 64 * 128))

    dt = timed_fb(PoolOnly(), (BATCH, 128, 128, 128), n_lo=64, n_hi=576)
    row("maxpool 128^2->64^2", dt, 0)

    dt = timed_fb(Res(128), (BATCH, 64, 64, 128))
    row("res 128->128 @64^2", dt,
        2 * BATCH * 64 * 64 * (128 * 64 + 9 * 64 * 64 + 64 * 128))

    dt = timed_fb(Res(256), (BATCH, 64, 64, 128))
    row("res 128->256 @64^2", dt,
        2 * BATCH * 64 * 64 * (128 * 128 + 9 * 128 * 128 + 128 * 256))

    # Pool backward formulation A/B: reduce_window's backward lowers to
    # SelectAndScatter (slow on TPU); the strided-slice max backward is
    # plain selects + pads. The round-4 inference A/B picked reduce_window
    # for the EVAL graph; training may rank them the other way.
    print("\npool fwd+bwd formulation A/B (ms):")

    def strided_pool(x):
        x = jnp.maximum(x[:, 0::2], x[:, 1::2])
        return jnp.maximum(x[:, :, 0::2], x[:, :, 1::2])

    def fb_of(pool):
        def fb(xx):
            return jax.value_and_grad(
                lambda xi: jnp.sum(pool(xi).astype(jnp.float32)))(xx)
        return fb

    for shape in ((BATCH, 128, 128, 128), (BATCH, 64, 64, 256),
                  (BATCH, 32, 32, 256), (BATCH, 16, 16, 256)):
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        dt_rw = time_fn(fb_of(max_pool_2x2), x, n_lo=32, n_hi=288)
        dt_st = time_fn(fb_of(strided_pool), x, n_lo=32, n_hi=288)
        print(f"  {str(shape):22s} reduce_window {dt_rw*1e3:7.4f}"
              f"   strided {dt_st*1e3:7.4f}")


if __name__ == "__main__":
    main()
