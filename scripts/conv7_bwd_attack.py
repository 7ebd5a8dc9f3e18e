"""Attack the stem conv7's 18.9x-roofline backward (ROUND4_NOTES).

The space-to-depth stem conv (4x4 stride-1 over 12 packed channels,
ops/blocks._SpaceToDepthConv7) measures 0.73 ms fwd+bwd vs a 0.039 ms
roofline. This script attributes dx vs dW and times candidate
reformulations of the slow part in isolation:

  a) baseline        - conv_general_dilated, grad w.r.t. (x, W) / x-only / W-only
  b) channel-pad     - pad packed input 12 -> 128 lanes (kernel too), slice dW
  c) im2col matmul   - dW as one (K*K*C, N*H*W) @ (N*H*W, F) dot_general

Run: python scripts/conv7_bwd_attack.py   (real chip)
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from progressive_process_for_human_pose_estimation_tpu.bench.components import (  # noqa: E402
    time_fn,
)

PEAK = 191.5e12
B, H, W, C, F = 8, 128, 128, 12, 64
KH = KW = 4
PAD = ((2, 1), (2, 1))
FWD_FLOPS = 2 * B * H * W * KH * KW * C * F


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), PAD, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def report(name, dt, flops=FWD_FLOPS, scale=1):
    roof = scale * flops / PEAK * 1e3
    print(f"{name:34s} {dt*1e3:8.4f} ms   roofline {roof:7.4f}   "
          f"x{dt*1e3/roof:6.1f}")


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (KH, KW, C, F), jnp.bfloat16)

    def loss(xx, kk):
        return jnp.sum(conv(xx, kk).astype(jnp.float32))

    dt = time_fn(lambda xx: jax.value_and_grad(loss, (0, 1))(xx, k), x,
                 n_lo=64, n_hi=576)
    report("baseline fwd+dx+dW", dt, scale=3)
    dt = time_fn(lambda xx: jax.value_and_grad(loss, 0)(xx, k), x,
                 n_lo=64, n_hi=576)
    report("baseline fwd+dx only", dt, scale=2)
    dt = time_fn(lambda xx: jax.value_and_grad(loss, 1)(xx, k), x,
                 n_lo=64, n_hi=576)
    report("baseline fwd+dW only", dt, scale=2)

    # b) channel-pad to full 128 lanes.
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - C)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 128 - C), (0, 0)))

    def loss_p(xx, kk):
        return jnp.sum(conv(xx, kk).astype(jnp.float32))

    flops_p = FWD_FLOPS * 128 // C
    dt = time_fn(lambda xx: jax.value_and_grad(loss_p, (0, 1))(xx, kp), xp,
                 n_lo=64, n_hi=576)
    report("chan-pad128 fwd+dx+dW", dt, flops=flops_p, scale=3)

    # c) dW as an im2col matmul: patches (N*H*W, KH*KW*C) ^T @ dy (N*H*W, F).
    dy = jnp.ones((B, H, W, F), jnp.bfloat16)

    def dw_im2col(xx):
        xpad = jnp.pad(xx, ((0, 0), (2, 1), (2, 1), (0, 0)))
        cols = []
        for i in range(KH):
            for j in range(KW):
                cols.append(
                    jax.lax.dynamic_slice(xpad, (0, i, j, 0), (B, H, W, C)))
        patches = jnp.concatenate(cols, axis=-1).reshape(-1, KH * KW * C)
        dw = jax.lax.dot_general(
            patches, dy.reshape(-1, F), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dw.reshape(KH, KW, C, F)

    dt = time_fn(dw_im2col, x, n_lo=64, n_hi=576)
    report("dW im2col matmul (alone)", dt, scale=1)

    # correctness: im2col dW == autodiff dW
    dw_ref = jax.grad(loss, 1)(x, k)
    dw_new = dw_im2col(x).astype(dw_ref.dtype)
    err = jnp.max(jnp.abs(dw_ref - dw_new)) / jnp.maximum(
        jnp.max(jnp.abs(dw_ref)), 1e-6)
    print(f"im2col dW max rel err vs autodiff: {float(err):.3e}")


if __name__ == "__main__":
    main()
