"""Attribute + attack the stem module's non-conv backward overhead.

scripts/conv7_bwd_attack.py showed the PACKED conv alone is 0.247 ms
fwd+dx+dW, yet the full _SpaceToDepthConv7 module (scripts/stem_bwd_attrib)
measures 0.728 ms — ~0.48 ms lives around the conv: the space-to-depth
input transpose (+ its scatter-transpose backward over a 3-channel minor
dim) and the kernel pad/reshape transform's backward. This script:

  1) attributes module fwd / fwd+dW / fwd+dx,
  2) times the s2d rearrangement alone (reshape-transpose form vs a
     strided-slice-concat form), fwd and fwd+bwd,
  3) times a module variant using the strided-slice s2d end-to-end.

Run: python scripts/stem_s2d_attack.py   (real chip)
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from progressive_process_for_human_pose_estimation_tpu.bench.components import (  # noqa: E402
    time_fn,
)
from progressive_process_for_human_pose_estimation_tpu.ops.blocks import (  # noqa: E402
    _SpaceToDepthConv7,
)

PEAK = 191.5e12
B, H, W, C, F = 8, 256, 256, 3, 64
FWD_FLOPS = 2 * B * (H // 2) * (W // 2) * 49 * C * F


def report(name, dt, scale):
    roof = scale * FWD_FLOPS / PEAK * 1e3
    print(f"{name:34s} {dt*1e3:8.4f} ms   roofline {roof:7.4f}   "
          f"x{dt*1e3/roof:6.1f}")


def s2d_transpose(x):
    n, h, w, c = x.shape
    xb = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def s2d_slices(x):
    # (dy, dx, c) packed order must match the kernel interleave:
    # channel block index = dy*2 + dx.
    return jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 0::2, 1::2],
         x[:, 1::2, 0::2], x[:, 1::2, 1::2]], axis=-1)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)

    module = _SpaceToDepthConv7(features=F, dtype=jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(1), x)
    params = variables["params"]

    def loss(p, xx):
        return jnp.sum(module.apply({"params": p}, xx).astype(jnp.float32))

    dt = time_fn(lambda xx: loss(params, xx), x, n_lo=64, n_hi=576)
    report("module fwd only", dt, 1)
    dt = time_fn(lambda xx: jax.value_and_grad(loss, 0)(params, xx), x,
                 n_lo=64, n_hi=576)
    report("module fwd+dW", dt, 2)
    dt = time_fn(lambda xx: jax.value_and_grad(loss, 1)(params, xx), x,
                 n_lo=64, n_hi=576)
    report("module fwd+dx", dt, 2)
    dt = time_fn(lambda xx: jax.value_and_grad(loss, (0, 1))(params, xx), x,
                 n_lo=64, n_hi=576)
    report("module fwd+dx+dW", dt, 3)

    # s2d rearrangement alone (pure data movement; 3.1 MB in/out bf16).
    print()
    for name, fn in (("s2d reshape-transpose", s2d_transpose),
                     ("s2d strided-slices", s2d_slices)):
        dt = time_fn(fn, x, n_lo=128, n_hi=1152)
        print(f"{name:34s} fwd {dt*1e3:8.4f} ms", end="")
        dt = time_fn(
            lambda xx, f=fn: jax.value_and_grad(
                lambda xi: jnp.sum(f(xi).astype(jnp.float32)))(xx),
            x, n_lo=64, n_hi=576)
        print(f"   fwd+bwd {dt*1e3:8.4f} ms")

    # check the two rearrangements agree
    d = jnp.max(jnp.abs(s2d_transpose(x) - s2d_slices(x)))
    print(f"\ns2d forms max abs diff: {float(d):.3e}")

    # Module variant: strided-slice s2d, same packed kernel transform.
    kernel = params["kernel"]

    def loss_sl(p, xx):
        k = jnp.pad(p, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, C, F)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, F)
        xb = s2d_slices(xx)
        y = jax.lax.conv_general_dilated(
            xb, k.astype(jnp.bfloat16), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32))

    base = module.apply({"params": params}, x)
    alt_fwd = jax.jit(lambda xx: jax.grad(loss_sl, 1)(kernel, xx))  # warm path
    del alt_fwd, base
    dt = time_fn(lambda xx: loss_sl(kernel, xx), x, n_lo=64, n_hi=576)
    report("slices variant fwd only", dt, 1)
    dt = time_fn(
        lambda xx: jax.value_and_grad(loss_sl, (0, 1))(kernel, xx), x,
        n_lo=64, n_hi=576)
    report("slices variant fwd+dx+dW", dt, 3)


if __name__ == "__main__":
    main()
