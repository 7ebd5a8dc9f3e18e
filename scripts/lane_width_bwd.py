"""Pin the 128^2 residual's 5.3x-roofline backward on lane-thin channels.

Equal-FLOP, equal-byte A/B: conv3x3 64->64 @128^2 vs conv3x3 128->128 @64^2
vs 256->256 @32^2 (all 2*8*9*64^2*128^2*... = same product), fwd+dx+dW.
If the 64-channel variant is the slow one, the stem residual's excess is
the same lane-padding physics as the conv7 stem (v5e lanes = 128; a
64-wide channel dim wastes half the MXU on every backward contraction),
not something a rewrite can fix while the architecture says 64 channels.

Run: python scripts/lane_width_bwd.py   (real chip)
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from progressive_process_for_human_pose_estimation_tpu.bench.components import (  # noqa: E402
    time_fn,
)

PEAK = 191.5e12
B = 8


def main():
    cases = [(128, 64), (64, 128), (32, 256), (16, 512)]
    for hw, c in cases:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, c),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c),
                              jnp.bfloat16)
        flops = 2 * B * hw * hw * 9 * c * c
        roof = 3 * flops / PEAK * 1e3

        def loss(kk, xx):
            y = jax.lax.conv_general_dilated(
                xx, kk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        dt = time_fn(lambda xx: jax.value_and_grad(loss, (0, 1))(k, xx), x,
                     n_lo=32, n_hi=288)
        print(f"conv3x3 {c:3d}ch @{hw:3d}^2   {dt*1e3:8.4f} ms   "
              f"roofline {roof:7.4f}   x{dt*1e3/roof:5.2f}")


if __name__ == "__main__":
    main()
