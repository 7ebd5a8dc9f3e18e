"""Single-read fused BN statistics (pallas_kernels/bn_stats.py): must match
the exact two-pass moments, INCLUDING the var << mean^2 regime that the
one-pass E[x^2]-E[x]^2 form cancels catastrophically on (the reason
ops/blocks uses two-pass — ROUND4_NOTES BatchNorm section)."""

import numpy as np

import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.bn_stats import (
    bn_stats_fused,
)


def test_normal_regime(rng):
    x = rng.normal(3, 2, (4, 16, 16, 128)).astype(np.float32)
    m, v = bn_stats_fused(jnp.asarray(x), interpret=True)
    flat = x.reshape(-1, 128).astype(np.float64)
    np.testing.assert_allclose(np.asarray(m), flat.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v), flat.var(0), rtol=1e-5)


def test_catastrophic_cancellation_regime(rng):
    # var ~ 1e-4, mean^2 ~ 1e6: one-pass fp32 loses ALL variance digits;
    # the shifted accumulation must stay within ~1e-3 relative.
    x = (1000.0 + rng.normal(0, 0.01, (2, 8, 8, 128))).astype(np.float32)
    m, v = bn_stats_fused(jnp.asarray(x), interpret=True)
    flat = x.reshape(-1, 128).astype(np.float64)
    np.testing.assert_allclose(np.asarray(m), flat.mean(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), flat.var(0), rtol=1e-3)


def test_batchnorm_integration_context(rng):
    """fused_bn_stats() context: batch-stat BN through the module must give
    the same normalized output as the exact two-pass path."""
    import jax

    from progressive_process_for_human_pose_estimation_tpu.ops.blocks import (
        BatchNorm,
        fused_bn_stats,
    )

    bn = BatchNorm(use_running_average=False, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(2, 3, (2, 16, 16, 128)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)
    ref, _ = bn.apply(variables, x, mutable=["batch_stats"])
    import progressive_process_for_human_pose_estimation_tpu.pallas_kernels.bn_stats as bs

    orig = bs.bn_stats_fused
    bs.bn_stats_fused = lambda xx: orig(xx, interpret=True)
    try:
        with fused_bn_stats():
            got, _ = bn.apply(variables, x, mutable=["batch_stats"])
    finally:
        bs.bn_stats_fused = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
