"""int8 inference path (pallas_kernels/int8_infer.py): calibrated static
scales + per-channel int8 weights must track the bf16 fast path closely, and
the projection Pallas kernel (interpret mode on CPU) must match the folded
reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.models import StackedHourglass


def small_flagship(variant="plain", out_channels=8):
    return StackedHourglass(
        n_stack=2, out_channels=out_channels, features=32, hourglass_depth=2,
        variant=variant, use_running_average=True, dtype=jnp.float32,
    )


class TestInt8Path:
    @pytest.mark.slow
    def test_tracks_bf16_fast_path(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fast_infer import (
            build_fast_apply,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
            build_int8_apply,
            calibrate,
        )

        m = small_flagship()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = build_fast_apply(m, v, residual_impl="fast")(x)
        scales = calibrate(m, v, x)
        out = build_int8_apply(m, v, scales)(x)
        for a, b in zip(ref, out):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
            assert rel < 0.05, rel
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.999, corr

    def test_skeleton_merge_variant(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models.recursive import (
            COCO_SKELETON,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
            build_int8_apply,
            calibrate,
        )

        m = small_flagship(variant="skeleton_merge", out_channels=38)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        scales = calibrate(m, v, x)
        out = build_int8_apply(m, v, scales)(x)
        assert len(out) == len(ref)
        for a, b in zip(ref, out):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            assert b.shape == a.shape
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.995, corr

    def test_weight_quantization_roundtrip(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
            _quant_w,
        )

        w = jnp.asarray(rng.standard_normal((3, 3, 16, 24)).astype(np.float32))
        wq, s = _quant_w(w)
        back = np.asarray(wq, np.float32) * np.asarray(s)
        # max quantization error bounded by half a step per channel
        err = np.abs(back - np.asarray(w)).max(axis=(0, 1, 2))
        assert (err <= np.asarray(s) * 0.5 + 1e-7).all()


class TestProjKernelInterpret:
    def test_matches_folded_reference(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.ops import (
            ResidualBlockLite,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fused_residual import (
            fold_lite_residual_params,
            lite_residual_fast,
            lite_residual_pallas,
        )

        m = ResidualBlockLite(24, use_running_average=True, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 16)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(
            lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
            if a.ndim == 1 else a,
            v,
        )
        fp = fold_lite_residual_params(v["params"], v["batch_stats"], jnp.float32)
        assert "w4" in fp  # 16 -> 24 needs the projection path
        ref = np.asarray(lite_residual_fast(x, fp))
        out = np.asarray(lite_residual_pallas(x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


class TestInt8FusedPallas:
    """Fused VMEM int8 kernel (pallas_kernels/int8_fused.py), interpret mode
    on CPU: must match the XLA int8 formulation (same math, scales folded
    into affines) and track the bf16 model."""

    def _block_inputs(self, c=32, hw=16):
        from progressive_process_for_human_pose_estimation_tpu.ops.blocks import (
            ResidualBlockLite,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fused_residual import (
            fold_lite_residual_params,
        )

        blk = ResidualBlockLite(c, use_running_average=True, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, c), jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        fp = fold_lite_residual_params(v["params"], v["batch_stats"],
                                       jnp.float32)
        ref = blk.apply(v, x)
        return x, fp, ref

    def test_matches_xla_int8_block(self):
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_fused import (
            fuse_int8_block_params,
            int8_residual_pallas,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
            int8_lite_residual,
            quantize_lite_residual,
        )

        x, fp, _ = self._block_inputs()
        # Static scales as calibrate() would produce them.
        y = np.maximum(np.asarray(x) * np.asarray(fp["a0"]) + np.asarray(fp["b0"]), 0)
        scales = {"y": float(np.abs(y).max()) / 127.0, "h1": 0.05, "h2": 0.08,
                  "x": 1.0}
        q_xla = quantize_lite_residual(fp)
        ref = int8_lite_residual(x, q_xla, scales)
        q_fused = fuse_int8_block_params(fp, scales)
        out = int8_residual_pallas(x, q_fused, interpret=True)
        a, b = np.asarray(ref, np.float32), np.asarray(out, np.float32)
        # Same quantized math, different float associativity (the fused path
        # folds the scales into affines computed in fp32).
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.02, rel
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999

    def test_tracks_bf16_block(self):
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_fused import (
            fuse_int8_block_params,
            int8_residual_pallas,
        )

        x, fp, ref = self._block_inputs(c=32, hw=8)
        # Calibrate the three activation scales from the float forward.
        y = np.maximum(np.asarray(x) * np.asarray(fp["a0"]) + np.asarray(fp["b0"]), 0)
        h1 = np.maximum(
            np.einsum("bhwc,cm->bhwm", y, np.asarray(fp["w1"])) + np.asarray(fp["b1"]), 0
        )
        scales = {
            "y": float(np.abs(y).max()) / 127.0,
            "h1": float(np.abs(h1).max()) / 127.0,
            "h2": float(np.abs(h1).max()) / 127.0,  # same order of magnitude
        }
        q = fuse_int8_block_params(fp, scales)
        out = int8_residual_pallas(x, q, interpret=True)
        a, b = np.asarray(ref, np.float32), np.asarray(out, np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.08, rel
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995

    @pytest.mark.slow
    def test_full_model_interpret(self):
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_fused import (
            build_int8_pallas_apply,
        )
        from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
            calibrate,
        )

        m = small_flagship(variant="skeleton_merge", out_channels=38)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        scales = calibrate(m, v, x)
        out = build_int8_pallas_apply(m, v, scales, min_hw=4, max_hw=16,
                                      interpret=True)(x)
        assert len(out) == len(ref)
        for a, b in zip(ref, out):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
