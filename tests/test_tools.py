"""Smoke tests for the auxiliary tools: predict/figure CLIs, LSP renderer,
fused-kernel folding path."""

import os

import numpy as np

import jax
import jax.numpy as jnp


class TestPredictCLI:
    def test_synthetic_prediction_figure(self, tmp_path):
        from cli import predict

        out = str(tmp_path / "pred.png")
        predict.main(
            ["--preset", "progressive_coco", "--features", "16",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "64", "--out", out, "--threshold", "0.0"]
        )
        assert os.path.exists(out)


class TestFigureCLI:
    def test_architecture_figure(self, tmp_path):
        from cli import figure

        out = str(tmp_path / "arch.png")
        figure.main(["--out", out])
        assert os.path.exists(out)


class TestLSPRenderer:
    def test_normalized_gauss_targets(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.data import (
            make_lsp_batch_fn,
        )

        n = 2
        images = jnp.asarray(rng.random((n, 256, 256, 3)).astype(np.float32))
        kps = np.zeros((n, 14, 3), np.float32)
        kps[:, :, 0] = rng.uniform(10, 200, (n, 14))
        kps[:, :, 1] = rng.uniform(10, 200, (n, 14))
        dims = np.full((n, 2), 220, np.int32)
        fn = make_lsp_batch_fn()
        out = fn(images, jnp.asarray(kps), jnp.asarray(dims))
        g = np.asarray(out["gauss_maps"])
        assert g.shape == (n, 64, 64, 14)
        # normalized form peaks at ~1/(2*pi) for sigma=1
        np.testing.assert_allclose(g.max(), 1 / (2 * np.pi), rtol=0.1)


class TestFusedKernels:
    def test_bn_folding_matches_module(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.ops import (
            ResidualBlockLite,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fused_residual import (
            fold_lite_residual_params,
            lite_residual_fast,
        )

        m = ResidualBlockLite(32, use_running_average=True, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(
            lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
            if a.ndim == 1 else a,
            v,
        )
        fp = fold_lite_residual_params(v["params"], v["batch_stats"], jnp.float32)
        ref = np.asarray(m.apply(v, x))
        fast = np.asarray(lite_residual_fast(x, fp))
        np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)

    def test_fast_apply_matches_model(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            StackedHourglass,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fast_infer import (
            build_fast_apply,
        )

        m = StackedHourglass(
            n_stack=2, out_channels=8, features=32, hourglass_depth=2,
            use_running_average=True, dtype=jnp.float32,
        )
        x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        fast = build_fast_apply(m, v, residual_impl="fast")(x)
        for a, b in zip(ref, fast):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                rtol=0.1, atol=0.05,  # fast path computes in bf16
            )


class TestDiffSpanGuard:
    """_diff_span must widen through sub-jitter spans and refuse to report
    garbage when widening cannot help."""

    def test_widens_until_measurable(self):
        from progressive_process_for_human_pose_estimation_tpu.bench.timing import (
            _diff_span,
        )

        per_iter = 1e-3  # 1 ms/iter: n_hi=12 span is 10 ms < 50 ms floor

        def fake_time_n(n):
            return 0.03 + per_iter * n  # fixed overhead + linear cost

        dt = _diff_span(fake_time_n, 2, 12)
        assert abs(dt - per_iter) / per_iter < 1e-6

    def test_raises_on_jitter_floor(self):
        import pytest

        from progressive_process_for_human_pose_estimation_tpu.bench.timing import (
            _diff_span,
        )

        with pytest.raises(RuntimeError, match="jitter floor"):
            _diff_span(lambda n: 0.03, 2, 12)  # constant: span always 0
