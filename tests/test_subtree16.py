"""The <=16^2 subtree megakernel (pallas_kernels/subtree16.py) must equal
the folded-jnp composition it replaces — same residuals, pools, bilinear
align-corners upsamples (/root/reference/only_one_hourgless.py:168-196's two
innermost nestings) — both standalone (interpret mode) and through the
build_fast_apply('subtree') full-model path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.ops.resize import (
    max_pool_2x2,
    upsample2x_bilinear_align_corners,
)
from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fused_residual import (
    lite_residual_fast,
)
from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.subtree16 import (
    subtree16_pallas,
)


def _fake_fp(rng, c, m, dtype=jnp.float32):
    g = lambda *s: jnp.asarray(rng.normal(0, 0.1, s), dtype)
    return {
        "a0": 1 + g(c), "b0": g(c), "w1": g(c, m), "b1": g(m),
        "w2": g(3, 3, m, m), "b2": g(m), "w3": g(m, c), "b3": g(c),
    }


def _ref_subtree(h, fp2, fp1, n_modules=2):
    def mods(v, fp):
        for _ in range(n_modules):
            v = lite_residual_fast(v, fp)
        return v

    up1 = mods(h, fp2)
    low1 = mods(max_pool_2x2(h), fp2)
    iup1 = mods(low1, fp1)
    ilow1 = mods(max_pool_2x2(low1), fp1)
    ilow3 = mods(mods(ilow1, fp1), fp1)
    low2 = iup1 + upsample2x_bilinear_align_corners(ilow3)
    low3 = mods(low2, fp2)
    return up1 + upsample2x_bilinear_align_corners(low3)


def test_subtree16_matches_composition(rng):
    c, m, b = 32, 16, 1
    fp2, fp1 = _fake_fp(rng, c, m), _fake_fp(rng, c, m)
    x = jnp.asarray(rng.normal(0, 1, (b, 16, 16, c)), jnp.float32)
    ref = np.asarray(_ref_subtree(x, fp2, fp1))
    got = np.asarray(subtree16_pallas(x, fp2, fp1, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_subtree16_through_fast_apply(rng):
    """Full-model route: build_fast_apply('subtree') == ('fast') on a
    reduced-width flagship at the real 256^2 input (the 16^2 level only
    exists at full input geometry)."""
    from progressive_process_for_human_pose_estimation_tpu.models import (
        build_model,
    )
    from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fast_infer import (
        build_fast_apply,
    )

    model = build_model(
        "hourglass8_skeleton", use_running_average=True, features=32,
        n_stack=2, dtype=jnp.float32,
    )
    x = jnp.asarray(rng.normal(0, 1, (1, 256, 256, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(
        build_fast_apply(model, variables, residual_impl="fast")(x)[-1],
        np.float32)
    got = np.asarray(
        build_fast_apply(model, variables, residual_impl="subtree",
                         interpret=True)(x)[-1], np.float32)
    # Both paths compute in bf16; two stacks of rounding-order differences
    # accumulate (same tolerance class as test_tools' fast-vs-flax check).
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, corr
