"""The two-model comparison workflow end-to-end — the reference's headline
deliverable (/root/reference/performance_compare.py:618-762): train two tiny
presets, checkpoint both, run cli.compare over the same batches, get both
detection-rate curves. Plus cli.graph and the mask-gated cli.predict flow
(/root/reference/train.py:1005-1038) as smokes."""

import pytest

pytestmark = pytest.mark.slow  # trains/compares real checkpoints; the suite's heaviest file

import os

import numpy as np


COMMON = [
    "--features", "16", "--hourglass-depth", "1",
    "--dtype", "float32", "--input-size", "64",
    "--batch-size", "4", "--n-synthetic", "8",
]


def _train(preset, objective, ckpt, extra=()):
    from cli import train

    state = train.main(
        ["--preset", preset, "--objective", objective,
         "--epochs", "1", "--log-every", "1", "--save", ckpt, *extra]
        + COMMON
    )
    assert int(state.epoch) == 1
    return state


class TestCompareWorkflow:
    def test_two_trained_models_compare(self, tmp_path):
        from cli import compare

        ckpt_a = str(tmp_path / "ckpt_a")
        ckpt_b = str(tmp_path / "ckpt_b")
        # Model A: the progressive family (scored WITH the background-channel
        # offset); model B: a Gauss-head baseline (scored without), exactly
        # the performance_compare.py pairing.
        _train("progressive_coco", "progressive", ckpt_a)
        _train("recursive_4stack_coco", "classic_mse", ckpt_b)

        results = compare.main(
            ["--preset-a", "progressive_coco", "--load-a", ckpt_a,
             "--preset-b", "recursive_4stack_coco", "--load-b", ckpt_b]
            + COMMON
        )
        for tag in ("a", "b"):
            curve = results[tag]
            assert curve.shape == (11,)
            assert np.all(np.isfinite(curve))
            assert np.all(np.diff(curve) >= -1e-7)  # nondecreasing in t

    def test_compare_without_checkpoints(self):
        from cli import compare

        results = compare.main(
            ["--preset-a", "progressive_coco",
             "--preset-b", "recursive_4stack_coco"] + COMMON
        )
        assert results["a"].shape == results["b"].shape == (11,)


class TestGraphSmoke:
    def test_tabulate_and_hlo(self, tmp_path, capsys):
        from cli import graph

        hlo = str(tmp_path / "model.hlo.txt")
        graph.main(
            ["--preset", "progressive_coco", "--features", "16",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "64", "--hlo-out", hlo]
        )
        out = capsys.readouterr().out
        assert "ProgressiveHourglass" in out
        assert os.path.exists(hlo) and os.path.getsize(hlo) > 1000


class TestMaskGatedPredict:
    def test_mask_gate_flow(self, tmp_path):
        from cli import predict, train

        mask_ckpt = str(tmp_path / "masknet")
        # Train the MaskNet preset one epoch on the stage-1 background task.
        _train("masknet", "mask_only", mask_ckpt)

        out_png = str(tmp_path / "gated.png")
        predict.main(
            ["--preset", "progressive_coco", "--features", "16",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "64", "--mask-gate", "--mask-load", mask_ckpt,
             "--out", out_png]
        )
        assert os.path.exists(out_png)


class TestBenchmarkSmoke:
    def test_inference_json(self):
        from cli import benchmark

        out = benchmark.main(
            ["--preset", "progressive_coco", "--features", "16",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "32", "--batch", "2", "--json"]
        )
        assert out["images_per_sec"] > 0
        assert out["sec_per_batch"] > 0

    def test_train_step_mode(self):
        from cli import benchmark

        out = benchmark.main(
            ["--preset", "progressive_coco", "--features", "16",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "32", "--batch", "2", "--train", "--json"]
        )
        assert out["images_per_sec"] > 0


class TestBenchmarkEvalBN:
    def test_batch_bn_inference(self):
        """--experiment hourglass8_skeleton benchmarks the batch-stat-BN
        graph (its faithful test-time mode)."""
        from cli import benchmark

        out = benchmark.main(
            ["--experiment", "hourglass8_skeleton", "--features", "8",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "32", "--batch", "2", "--json"]
        )
        assert out["images_per_sec"] > 0

    def test_batch_bn_refuses_fold(self):
        import pytest

        from cli import benchmark

        with pytest.raises(SystemExit):
            benchmark.main(
                ["--experiment", "hourglass8_skeleton", "--features", "8",
                 "--hourglass-depth", "1", "--dtype", "float32",
                 "--input-size", "32", "--batch", "2", "--fold"]
            )


class TestComparePerSideBN:
    def test_split_channel_side_resolves_batch_and_kp_block(self, tmp_path):
        """Comparing a try_* split-channel preset against the classic
        baseline: side A infers batch-stat BN + keypoint-block softmax from
        the EXPERIMENTS registry, side B (classic_baseline → .eval()
        provenance) stays on running stats — all without --eval-bn."""
        from cli import compare

        ckpt_a = str(tmp_path / "ckpt_a")
        _train("hourglass8_skeleton", "split_channel", ckpt_a)

        results = compare.main(
            ["--preset-a", "hourglass8_skeleton", "--load-a", ckpt_a,
             "--preset-b", "recursive_4stack_coco"]
            + COMMON
        )
        for tag in ("a", "b"):
            curve = results[tag]
            assert curve.shape == (11,)
            assert np.all(np.isfinite(curve))


class TestMakeEvalStepBatchMode:
    def test_library_eval_step_modes(self):
        """make_eval_step(batch_stats=True) equals a train-mode forward and
        differs from the running-stat step after EMA drift."""
        import jax
        import jax.numpy as jnp

        from progressive_process_for_human_pose_estimation_tpu.models import (
            build_model,
        )
        from progressive_process_for_human_pose_estimation_tpu.train import (
            make_eval_step,
        )

        kw = dict(features=8, hourglass_depth=1, dtype=jnp.float32)
        m_train = build_model("only_one_hourglass",
                              use_running_average=False, **kw)
        m_eval = build_model("only_one_hourglass",
                             use_running_average=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m_train.init(jax.random.PRNGKey(1), x)
        _, mut = m_train.apply(variables, x * 2.0 + 1.0,
                               mutable=["batch_stats"])
        params, stats = variables["params"], mut["batch_stats"]

        out_batch = make_eval_step(m_train, batch_stats=True)(params, stats, x)
        out_run = make_eval_step(m_eval)(params, stats, x)
        ref, _ = m_train.apply({"params": params, "batch_stats": stats}, x,
                               mutable=["batch_stats"])
        ref = ref if isinstance(ref, (list, tuple)) else [ref]
        # jit-vs-eager rounding only (make_eval_step jits; the ref is eager)
        np.testing.assert_allclose(np.asarray(out_batch[-1]),
                                   np.asarray(ref[-1], np.float32),
                                   atol=1e-4, rtol=1e-4)
        assert not np.allclose(np.asarray(out_batch[-1]),
                               np.asarray(out_run[-1]), atol=1e-3)


class TestCRFPredict:
    def test_crf_flag_refines_and_decodes(self, tmp_path):
        """--crf runs the mean-field refinement (the reference ships the
        helper with pydensecrf constants, try_different_stack.py:332-349)
        and decodes from refined probabilities."""
        import os

        from cli import predict

        out_png = str(tmp_path / "crf.png")
        predict.main(
            ["--preset", "progressive_coco", "--features", "16",
             "--hourglass-depth", "1", "--dtype", "float32",
             "--input-size", "64", "--crf", "--crf-iters", "2",
             "--out", out_png]
        )
        assert os.path.exists(out_png)


class TestDecodeModes:
    def test_normalized_peak_and_nms_decodes(self, tmp_path):
        """--decode normalized-peak / nms run end to end and draw a figure
        (try_different_stack.py:485-498 and the maximum_filter NMS,
        try_different_stack_without_skeleton.py:486-492)."""
        import os

        from cli import predict

        for mode in ("normalized-peak", "nms"):
            out_png = str(tmp_path / f"{mode}.png")
            predict.main(
                ["--preset", "progressive_coco", "--features", "16",
                 "--hourglass-depth", "1", "--dtype", "float32",
                 "--input-size", "64", "--decode", mode, "--out", out_png]
            )
            assert os.path.exists(out_png)
