"""Isolate the kernel-pack transform's cost in the stem backward.

stem_s2d_attack measured module fwd+dx+dW = 0.3585 ms while the bare packed
conv (pre-packed input AND pre-transformed kernel, conv7_bwd_attack) reads
0.2465 ms. The s2d input rearrangement is free (0.0074 ms); that leaves the
kernel pad/reshape/transpose (7,7,3,64)->(4,4,12,64) inside the
differentiated function as the suspect. A/B here:

  a) grad w.r.t. the PACKED kernel (transform outside)
  b) grad w.r.t. the UNPACKED kernel (transform inside, like the module)
  c) like b but the transform wrapped in a custom_vjp whose bwd is the
     explicit inverse (reshape/transpose/slice), in case autodiff of the
     pad picks a slow scatter form.

Run: python scripts/stem_ktransform_attack.py   (real chip)
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
FWD_FLOPS = 2 * B * H * W * 49 * 3 * F


def report(name, dt, scale=3):
    roof = scale * FWD_FLOPS / PEAK * 1e3
    print(f"{name:38s} {dt*1e3:8.4f} ms   roofline {roof:7.4f}   "
          f"x{dt*1e3/roof:6.1f}")


def pack(kernel):
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k = k.reshape(4, 2, 4, 2, 3, F)
    return k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, F)


@jax.custom_vjp
def pack_cv(kernel):
    return pack(kernel)


def _pack_fwd(kernel):
    return pack(kernel), None


def _pack_bwd(_, g):
    k = g.reshape(4, 4, 2, 2, 3, F).transpose(0, 2, 1, 3, 4, 5)
    return (k.reshape(8, 8, 3, F)[1:, 1:],)


pack_cv.defvjp(_pack_fwd, _pack_bwd)


def conv(xb, k):
    return jax.lax.conv_general_dilated(
        xb, k, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    xb = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
    kern = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, F), jnp.bfloat16)
    kp = pack(kern)

    # sanity: custom bwd equals autodiff bwd
    g1 = jax.grad(lambda k: jnp.sum(conv(xb, pack(k)).astype(jnp.float32)))(kern)
    g2 = jax.grad(lambda k: jnp.sum(conv(xb, pack_cv(k)).astype(jnp.float32)))(kern)
    print("custom pack-bwd max abs diff:",
          float(jnp.max(jnp.abs(g1.astype(jnp.float32) - g2.astype(jnp.float32)))))

    def loss_a(k, xx):
        return jnp.sum(conv(xx, k).astype(jnp.float32))

    def loss_b(k, xx):
        return jnp.sum(conv(xx, pack(k)).astype(jnp.float32))

    def loss_c(k, xx):
        return jnp.sum(conv(xx, pack_cv(k)).astype(jnp.float32))

    for name, lf, k in (("packed-kernel grad (outside)", loss_a, kp),
                        ("unpacked grad, autodiff pack", loss_b, kern),
                        ("unpacked grad, custom_vjp pack", loss_c, kern)):
        dt = time_fn(lambda xx, lf=lf, k=k: jax.value_and_grad(lf, (0, 1))(k, xx),
                     xb, n_lo=64, n_hi=576)
        report(name, dt)


if __name__ == "__main__":
    main()
