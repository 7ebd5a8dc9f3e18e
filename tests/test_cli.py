"""CLI smoke tests (tiny configs on the CPU mesh): train → checkpoint →
evaluate round trip, params reporting, and metric logger output."""

import os

import numpy as np
import pytest


class TestTrainCLI:
    @pytest.mark.slow
    def test_train_then_evaluate(self, tmp_path):
        from cli import evaluate, train

        ckpt = str(tmp_path / "ckpt")
        state = train.main(
            [
                "--preset", "progressive_coco",
                "--features", "16", "--hourglass-depth", "1",
                "--dtype", "float32", "--input-size", "64",
                "--batch-size", "4", "--n-synthetic", "8",
                "--epochs", "2", "--log-every", "1",
                "--save", ckpt,
            ]
        )
        assert int(state.epoch) == 2
        assert os.path.exists(ckpt)
        assert os.path.exists(ckpt + "_loss.png")

        curve = evaluate.main(
            [
                "--preset", "progressive_coco",
                "--features", "16", "--hourglass-depth", "1",
                "--dtype", "float32", "--input-size", "64",
                "--batch-size", "4", "--n-synthetic", "8",
                "--load", ckpt,
                "--plot", str(tmp_path / "curve.png"),
            ]
        )
        assert curve.shape == (11,)
        assert os.path.exists(tmp_path / "curve.png")

    @pytest.mark.slow
    def test_save_every_skips_intermediate_epochs(self, tmp_path, monkeypatch):
        """--save-every N writes only every Nth epoch plus the final one."""
        from cli import train
        from progressive_process_for_human_pose_estimation_tpu import (
            train as train_pkg,
        )

        saved_epochs = []
        real_save = train_pkg.save_checkpoint

        def counting_save(path, state, **kw):
            saved_epochs.append(int(state.epoch))
            return real_save(path, state, **kw)

        # cli.train imports the name from the train package at call time.
        monkeypatch.setattr(train_pkg, "save_checkpoint", counting_save)
        ckpt = str(tmp_path / "ckpt")
        train.main(
            [
                "--preset", "progressive_coco",
                "--features", "16", "--hourglass-depth", "1",
                "--dtype", "float32", "--input-size", "64",
                "--batch-size", "4", "--n-synthetic", "4",
                "--epochs", "3", "--save", ckpt, "--save-every", "2",
            ]
        )
        # epoch 2 (divisible) and epoch 3 (final) — never epoch 1.
        assert saved_epochs == [2, 3]

    def test_params_cli(self, capsys):
        from cli import params

        n, cost = params.main(
            ["--preset", "only_one_hourglass", "--features", "64",
             "--hourglass-depth", "2", "--input-size", "64", "--dtype", "float32"]
        )
        assert n > 10_000
        out = capsys.readouterr().out
        assert "params:" in out


class TestMetricLogger:
    def test_tensorboard_and_curves(self, tmp_path):
        from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
            MetricLogger,
            colorize_class_map,
            make_grid,
        )

        logger = MetricLogger(str(tmp_path / "runs"), "exp1")
        for s in range(3):
            logger.log_scalars(s, {"loss": 3.0 - s, "loss_2": 1.0})
        rng = np.random.default_rng(0)
        logger.log_images(
            0,
            rng.random((2, 32, 32, 3)).astype(np.float32),
            [rng.random((2, 8, 8, 5)).astype(np.float32)] * 3,
        )
        logger.save_loss_curve(str(tmp_path / "loss.png"))
        logger.close()
        event_files = list((tmp_path / "runs" / "exp1").glob("events*"))
        assert event_files, "tensorboard event file written"
        assert (tmp_path / "loss.png").exists()

        rgb = colorize_class_map(np.arange(16).reshape(4, 4))
        assert rgb.shape == (4, 4, 3)
        grid = make_grid(rng.random((3, 8, 8, 3)).astype(np.float32))
        assert grid.ndim == 3


class TestExport:
    def test_export_roundtrip(self, tmp_path):
        from cli import export as export_cli

        out = str(tmp_path / "m.jaxexport")
        export_cli.main([
            "--preset", "progressive_mpii", "--features", "16",
            "--hourglass-depth", "1", "--dtype", "float32",
            "--batch", "1", "--input-size", "32", "--out", out, "--check",
        ])
        import os
        assert os.path.getsize(out) > 1000

    def test_export_dynamic_batch(self, tmp_path):
        """--dynamic-batch: one artifact serves any batch size."""
        import numpy as np
        from jax import export as jax_export

        from cli import export as export_cli

        out = str(tmp_path / "md.jaxexport")
        export_cli.main([
            "--preset", "progressive_mpii", "--features", "16",
            "--hourglass-depth", "1", "--dtype", "float32",
            "--dynamic-batch", "--batch", "2", "--input-size", "32",
            "--out", out, "--check",
        ])
        with open(out, "rb") as f:
            served = jax_export.deserialize(f.read())
        for bs in (1, 3):
            y = served.call(np.zeros((bs, 32, 32, 3), np.float32))
            assert all(np.asarray(o).shape[0] == bs for o in y)

    def test_export_fold(self, tmp_path):
        """--fold artifact passes its own --check (folded live vs served)."""
        from cli import export as export_cli

        out = str(tmp_path / "mf.jaxexport")
        export_cli.main([
            "--preset", "progressive_mpii", "--features", "16",
            "--hourglass-depth", "1", "--dtype", "float32", "--fold",
            "--batch", "1", "--input-size", "32", "--out", out, "--check",
        ])
        import os
        assert os.path.getsize(out) > 1000

    @pytest.mark.slow
    def test_export_batch_bn(self, tmp_path):
        """--experiment hourglass8_skeleton exports a batch-stat-BN graph
        (the try_* test-branch behavior): the artifact's output depends on
        the batch composition, and --fold refuses batch mode."""
        import numpy as np
        import pytest
        from jax import export as jax_export

        from cli import export as export_cli

        out = str(tmp_path / "mb.jaxexport")
        export_cli.main([
            "--experiment", "hourglass8_skeleton", "--features", "8",
            "--hourglass-depth", "1", "--dtype", "float32",
            "--batch", "2", "--input-size", "32", "--out", out, "--check",
        ])
        with open(out, "rb") as f:
            served = jax_export.deserialize(f.read())
        rng = np.random.RandomState(0)
        a = rng.rand(2, 32, 32, 3).astype(np.float32)
        b = a.copy()
        b[1] += 1.0  # changing sample 1 shifts the batch statistics...
        ya = np.asarray(served.call(a)[-1])
        yb = np.asarray(served.call(b)[-1])
        # ...which moves sample 0's output too (running-stat graphs cannot)
        assert not np.allclose(ya[0], yb[0], atol=1e-5)

        with pytest.raises(SystemExit, match="--eval-bn running"):
            export_cli.main([
                "--experiment", "hourglass8_skeleton", "--features", "8",
                "--hourglass-depth", "1", "--dtype", "float32", "--fold",
                "--batch", "2", "--input-size", "32", "--out", out,
            ])


class TestHeadValidation:
    def test_preset_dataset_mismatch_rejected(self):
        """progressive_mpii heads (2,16,17) can't hold COCO synthetic targets
        (classes up to 19) — must exit with a clear error, not NaN-train."""
        from cli import train

        with pytest.raises(SystemExit, match="does not fit this dataset"):
            train.main([
                "--preset", "progressive_mpii", "--dataset", "synthetic",
                "--n-synthetic", "4", "--batch-size", "2", "--epochs", "1",
                "--features", "16", "--hourglass-depth", "1",
                "--input-size", "32", "--image-every", "0",
            ])


class TestScanStacksCLI:
    @pytest.mark.slow
    def test_train_scan_stacks_resume_into_loop(self, tmp_path):
        """--scan-stacks trains, and its checkpoint loads into the unrolled
        form (param trees are identical by construction)."""
        from cli import evaluate, train

        ckpt = str(tmp_path / "ckpt")
        common = [
            "--preset", "hourglass8_skeleton",
            "--features", "16", "--hourglass-depth", "1",
            "--dtype", "float32", "--input-size", "32",
            "--batch-size", "2", "--n-synthetic", "4",
        ]
        state = train.main(
            common + ["--epochs", "1", "--scan-stacks", "--save", ckpt]
        )
        assert int(state.epoch) == 1
        # evaluate WITHOUT --scan-stacks: the loop form must accept the ckpt
        curve = evaluate.main(common + ["--load", ckpt])
        assert curve is not None


class TestSyntheticSchema:
    @pytest.mark.slow
    def test_experiment_schema_inherited(self):
        """--dataset synthetic inherits the experiment's keypoint schema
        (classic_baseline is MPII: 16 joints, Gauss/MSE targets)."""
        from cli import train

        state = train.main(
            [
                "--experiment", "classic_baseline", "--dataset", "synthetic",
                "--features", "16", "--hourglass-depth", "1",
                "--dtype", "float32", "--input-size", "32",
                "--batch-size", "2", "--n-synthetic", "4", "--epochs", "1",
            ]
        )
        assert int(state.epoch) == 1

    def test_explicit_schema_flag(self):
        import argparse

        from cli.common import add_data_args, resolve_experiment

        p = argparse.ArgumentParser()
        add_data_args(p)
        p.add_argument("--experiment", default=None)
        args = p.parse_args(["--dataset", "synthetic",
                             "--synthetic-schema", "lsp"])
        resolve_experiment(args)
        assert args.synthetic_schema == "lsp"

    def test_default_schema_coco(self):
        import argparse

        from cli.common import add_data_args, resolve_experiment

        p = argparse.ArgumentParser()
        add_data_args(p)
        p.add_argument("--experiment", default=None)
        args = p.parse_args(["--dataset", "synthetic"])
        resolve_experiment(args)
        assert args.synthetic_schema == "coco"


class TestEvalScoringMode:
    """Gauss/MSE-headed models must be scored without the background-channel
    offset and without cross-channel softmax (the reference's PCKh_hourglass,
    performance_compare.py:581); CE models keep offset+softmax."""

    def _args(self, argv):
        from cli.evaluate import parse_args

        return parse_args(argv + ["--dataset", "synthetic"])

    def test_classic_mse_experiment_implies_gauss_scoring(self):
        from cli.evaluate import scoring_mode

        args = self._args(["--experiment", "classic_baseline"])
        assert scoring_mode(args) == (True, False)

    def test_ce_experiment_keeps_offset(self):
        from cli.evaluate import scoring_mode

        args = self._args(["--experiment", "hourglass8_skeleton"])
        assert scoring_mode(args) == (False, True)

    def test_explicit_flag(self):
        from cli.evaluate import scoring_mode

        args = self._args(["--preset", "classic_baseline",
                           "--no-background-offset"])
        assert scoring_mode(args) == (True, False)

    def test_mse_final_stage_experiments_imply_gauss_scoring(self):
        """progressive_2stage / with_aspp / more_layer end in an MSE Gauss
        head (no background channel) — softmax + channel offset would score
        every joint against its neighbour's distorted map."""
        from cli.evaluate import scoring_mode

        for exp in ("progressive_2stage", "with_aspp", "more_layer"):
            args = self._args(["--experiment", exp])
            assert scoring_mode(args) == (True, False), exp


class TestEvalBNMode:
    """Test-time BatchNorm provenance: only train.py:991 /
    hourglass_compare.py:1044 / performance_compare.py:619-620 call .eval();
    every try_* script's test branch runs torch modules in TRAIN mode, i.e.
    BN normalizes by current-batch statistics. For the weight-shared-BN
    try_* models this is load-bearing: one running-stat EMA averaged over 8
    stacks' different feature distributions normalizes none of them
    (measured on chip: hourglass8_skeleton at train-BN loss 1.66 scored
    PCKh 0% under running-stat eval)."""

    def test_provenance_and_resolution(self):
        import argparse

        from cli.common import resolve_experiment
        from progressive_process_for_human_pose_estimation_tpu.config import (
            EXPERIMENTS,
        )

        eval_calls = {"progressive_mpii_final", "classic_baseline"}
        for name, cfg in EXPERIMENTS.items():
            assert cfg.eval_batch_stats == (name not in eval_calls), name

        args = argparse.Namespace(experiment="hourglass8_skeleton", eval_bn=None)
        resolve_experiment(args)
        assert args.eval_bn == "batch"

        args = argparse.Namespace(experiment="classic_baseline", eval_bn=None)
        resolve_experiment(args)
        assert args.eval_bn == "running"

        # explicit flag wins; no experiment defaults to 'running' (.eval())
        args = argparse.Namespace(experiment="hourglass8_skeleton",
                                  eval_bn="running")
        resolve_experiment(args)
        assert args.eval_bn == "running"
        args = argparse.Namespace(eval_bn=None)
        resolve_experiment(args)
        assert args.eval_bn == "running"

    def test_batch_mode_differs_from_running_after_stat_drift(self):
        import jax
        import jax.numpy as jnp

        from cli.common import make_eval_apply
        from progressive_process_for_human_pose_estimation_tpu.models import (
            build_model,
        )

        kw = dict(features=8, hourglass_depth=1, dtype=jnp.float32)
        m_train = build_model("hourglass8_skeleton",
                              use_running_average=False, **kw)
        m_eval = build_model("hourglass8_skeleton",
                             use_running_average=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m_train.init(jax.random.PRNGKey(1), x)
        # Drift the EMAs with a shifted input distribution (stands in for
        # the per-stack distribution mismatch a shared BN accumulates).
        _, mut = m_train.apply(variables, x * 3.0 + 1.0,
                               mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}

        out_batch = make_eval_apply(m_train, True)(variables, x)[-1]
        out_running = make_eval_apply(m_eval, False)(variables, x)[-1]
        # batch mode is exactly a train-mode forward (EMA updates discarded)
        out_train_fwd, _ = m_train.apply(variables, x, mutable=["batch_stats"])
        assert np.array_equal(np.asarray(out_batch),
                              np.asarray(out_train_fwd[-1]))
        # and genuinely disagrees with running-stat eval after drift
        assert not np.allclose(np.asarray(out_batch),
                               np.asarray(out_running), atol=1e-3)

    @pytest.mark.slow
    def test_cli_train_then_batch_eval(self, tmp_path):
        """--experiment hourglass8_skeleton resolves eval_bn='batch' end to
        end; --fold refuses batch mode loudly."""
        from cli import evaluate, train

        common = [
            "--experiment", "hourglass8_skeleton",
            "--features", "8", "--hourglass-depth", "1",
            "--dtype", "float32", "--input-size", "64",
            "--batch-size", "4", "--n-synthetic", "4",
            "--dataset", "synthetic",
        ]
        ckpt = str(tmp_path / "ckpt")
        train.main(common + ["--epochs", "1", "--save", ckpt])
        curve = evaluate.main(common + ["--load", ckpt])
        assert curve.shape == (11,)

        with pytest.raises(SystemExit, match="--eval-bn running"):
            evaluate.main(common + ["--load", ckpt, "--fold"])


class TestSplitChannelScoring:
    def test_kp_block_softmax_scope(self):
        """38-ch split-channel outputs score PCKh from a softmax over ONLY
        the keypoint CE block [:18]: a large skeleton logit elsewhere must
        not move a keypoint channel's spatial argmax (it does under a
        cross-block softmax, whose denominator varies per pixel)."""
        import jax
        import jax.numpy as jnp

        from cli.evaluate import KP_BLOCK_OBJECTIVES, parse_args
        from progressive_process_for_human_pose_estimation_tpu.eval import (
            pckh_curve,
        )

        args = parse_args(["--experiment", "hourglass8_skeleton",
                           "--dataset", "synthetic"])
        assert KP_BLOCK_OBJECTIVES.get(args.objective) == 18

        h = w = 8
        out = jnp.zeros((1, h, w, 38))
        # keypoint 0 (channel 1) peaks at (2, 2) with a modest logit
        out = out.at[0, 2, 2, 1].set(3.0)
        # a HUGE skeleton logit at (5, 5) craters the full-38 softmax there
        # except at (5,5) itself where channel 1's small share of a huge
        # denominator... and a second modest kp logit at (5,5) that the
        # suppressed denominator would otherwise promote
        out = out.at[0, 5, 5, 1].set(3.5)
        out = out.at[0, 5, 5, 30].set(20.0)
        tgt = jnp.zeros((1, h, w), jnp.int32).at[0, 2, 2].set(1)
        rect = jnp.asarray([[0.0, 0.0, 4.0, 4.0]])

        block = jax.nn.softmax(out[..., :18], axis=-1)
        full = jax.nn.softmax(out, axis=-1)
        acc_block = pckh_curve(block, tgt, rect).accuracy
        acc_full = pckh_curve(full, tgt, rect).accuracy
        # block-scope scoring finds the true (5,5)>(2,2)? no: argmax of
        # channel 1 under block softmax is (5,5) -- both are kp logits and
        # 3.5 > 3.0, a genuine miss; under FULL softmax the huge skeleton
        # logit suppresses (5,5) and flips the argmax to (2,2), scoring a
        # spurious hit. The assertion pins the scopes apart.
        assert float(acc_block[0, -1]) == 0.0
        assert float(acc_full[0, -1]) == 1.0


class TestPerStepLossHistory:
    @pytest.mark.slow  # ~2 min: trains with per-step trace + resume
    def test_checkpoint_records_every_step_and_resumes(self, tmp_path):
        """The reference saves per-STEP loss record arrays inside every
        checkpoint (try_with_aspp.py:359-421); the device-side trace must
        record denser than the log cadence and keep appending on resume."""
        from cli import train
        from progressive_process_for_human_pose_estimation_tpu.train import (
            load_loss_history,
        )

        common = [
            "--preset", "progressive_coco",
            "--features", "16", "--hourglass-depth", "1",
            "--dtype", "float32", "--input-size", "64",
            "--batch-size", "4", "--n-synthetic", "8",
            "--log-every", "100",
        ]
        ckpt = str(tmp_path / "ckpt")
        train.main(common + ["--epochs", "3", "--save", ckpt])
        hist = load_loss_history(ckpt)
        # 8 images / batch 4 => 2 steps/epoch; 3 epochs => 6 recorded steps,
        # though log_every=100 printed only step 0.
        assert len(hist["loss"]) == 6
        assert np.all(np.isfinite(np.asarray(hist["loss"])))

        train.main(common + ["--epochs", "5", "--load", ckpt, "--save", ckpt])
        hist = load_loss_history(ckpt)
        assert len(hist["loss"]) == 10
        assert np.all(np.isfinite(np.asarray(hist["loss"])))


class TestDeviceLossTrace:
    def test_key_mismatch_rebuilds_on_live_keys(self):
        """Resuming under a different objective must not crash: the trace
        rebuilds on the live metric keys, carrying shared rows."""
        import jax.numpy as jnp

        from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
            DeviceLossTrace,
        )

        t = DeviceLossTrace(4)
        assert t.prefill({"loss": [1.0, 2.0], "loss_2": [3.0, 4.0]},
                         expected_steps=2)
        t.record(2, {"loss": jnp.asarray(9.0), "loss_stack0": jnp.asarray(7.0)})
        h = t.history()
        assert sorted(h) == ["loss", "loss_stack0"]
        assert list(h["loss"]) == [1.0, 2.0, 9.0]
        assert h["loss_stack0"][2] == 7.0

    def test_misaligned_prefill_disables_trace(self):
        """A log-cadence (sparse) or batch-size-changed history cannot be
        aligned — the trace disables itself so the caller's log-cadence
        fallback applies instead of saving a zero-riddled curve."""
        import jax.numpy as jnp

        from progressive_process_for_human_pose_estimation_tpu.utils.metrics import (
            DeviceLossTrace,
        )

        t = DeviceLossTrace(100)
        assert not t.prefill({"loss": [1.0, 2.0, 3.0]}, expected_steps=50)
        t.record(50, {"loss": jnp.asarray(9.0)})  # no-op: disabled
        assert t.history() == {}


class TestRefinerWorkflow:
    """creatModelD end-to-end (VERDICT r3 item 4): train a RefinerD on a
    frozen base model's composed input (cli.train --refine-base), then use
    it at prediction time (cli.predict --refine --refine-load).
    Reference: /root/reference/only_one_hourgless.py:257-283 (torch),
    model.py:121-143 (Keras original, the only lineage with targets)."""

    @pytest.mark.slow
    def test_refiner_train_then_predict(self, tmp_path):
        from cli import predict, train

        common = [
            "--features", "16", "--hourglass-depth", "1",
            "--dtype", "float32", "--input-size", "64",
        ]
        ckpt = str(tmp_path / "refiner_ckpt")
        state = train.main(
            [
                "--experiment", "refiner",
                "--refine-base", "recursive_4stack_coco",
                "--dataset", "synthetic", "--n-synthetic", "8",
                "--batch-size", "4", "--epochs", "1", "--log-every", "1",
                "--save", ckpt,
            ]
            + common
        )
        assert int(state.epoch) == 1
        assert os.path.exists(ckpt)
        # The refiner consumed the composed (base_channels + 3)-channel
        # input, not the raw image.
        conv1 = state.params["conv1"]["conv"]["kernel"]
        assert conv1.shape[2] == 17 + 3

        out = str(tmp_path / "refined.png")
        predict.main(
            [
                "--preset", "recursive_4stack_coco",
                "--refine", "--refine-load", ckpt,
                "--out", out,
            ]
            + common
        )
        assert os.path.exists(out)


class TestMultiImagePredict:
    """cli.predict's multi-image mode (round 5): several positional images
    share one model build / checkpoint restore / jit trace, --out becomes a
    directory of <stem><suffix>.png files — the workflow the reference's
    test branch runs by looping test_img/ (/root/reference/train.py:1288)."""

    _flags = ["--preset", "progressive_coco", "--features", "16",
              "--hourglass-depth", "1", "--dtype", "float32",
              "--input-size", "64"]

    def _write_inputs(self, tmp_path, n):
        from PIL import Image

        paths = []
        rng = np.random.default_rng(3)
        for i in range(n):
            p = str(tmp_path / f"photo{i}.jpg")
            Image.fromarray(
                (rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
            paths.append(p)
        return paths

    def test_multi_image_shared_session(self, tmp_path):
        from cli import predict

        paths = self._write_inputs(tmp_path, 2)
        out_dir = str(tmp_path / "preds")
        predict.main(paths + self._flags
                     + ["--out", out_dir, "--out-suffix", "_tag"])
        for i in range(2):
            assert os.path.exists(
                os.path.join(out_dir, f"photo{i}_tag.png"))

    def test_single_image_into_directory(self, tmp_path):
        """One image + an existing directory --out still lands a per-stem
        file (the isdir guard), instead of trying to overwrite the dir."""
        from cli import predict

        (path,) = self._write_inputs(tmp_path, 1)
        out_dir = str(tmp_path / "preds2")
        os.makedirs(out_dir)
        predict.main([path] + self._flags + ["--out", out_dir])
        assert os.path.exists(os.path.join(out_dir, "photo0.png"))
