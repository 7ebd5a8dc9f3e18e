"""Train-loop tests: one real optimization step on a tiny model, loss
decreases over a few steps, checkpoint round-trip, shape-filtered fine-tune
restore, and the full step sharded over the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.models import (
    ProgressiveHourglass,
)
from progressive_process_for_human_pose_estimation_tpu.parallel import (
    make_mesh,
    shard_batch,
)
from progressive_process_for_human_pose_estimation_tpu.train import (
    TrainState,
    create_train_state,
    make_train_step,
    maybe_resume,
    restore_checkpoint,
    save_checkpoint,
    shape_filtered_restore,
)
from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
    progressive_objective,
)

TINY = dict(features=16, hourglass_depth=1, dtype=jnp.float32)


def tiny_model():
    return ProgressiveHourglass(out_channels=(2, 4, 5), **TINY)


def tiny_batch(rng, n=2, size=32):
    return {
        "image": jnp.asarray(rng.random((n, size, size, 3)).astype(np.float32)),
        "skeleton_map": jnp.asarray(rng.integers(0, 4, (n, size // 4, size // 4))),
        "keypoint_map": jnp.asarray(rng.integers(0, 5, (n, size // 4, size // 4))),
    }


class TestTrainStep:
    def test_loss_decreases(self, rng):
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        batch = tiny_batch(rng)
        losses = []
        for _ in range(12):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))
        assert int(state.step) == 12

    @pytest.mark.slow
    def test_finite_flag(self, rng):
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        _, metrics = step(state, tiny_batch(rng))
        assert bool(metrics["finite"])

    @pytest.mark.slow
    def test_batch_stats_update(self, rng):
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        before = jax.tree.leaves(state.batch_stats)[0].copy()
        state, _ = step(state, tiny_batch(rng))
        after = jax.tree.leaves(state.batch_stats)[0]
        assert np.abs(np.asarray(after - before)).max() > 0


class TestSharded:
    def test_step_on_8_device_mesh(self, rng):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        batch = shard_batch(tiny_batch(rng, n=8), mesh)
        # batch really is sharded over the data axis
        assert len(batch["image"].sharding.device_set) == 8
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.slow
    def test_sharded_matches_single_device(self, rng):
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        batch = tiny_batch(rng, n=8)
        _, m_single = step(state, batch)
        mesh = make_mesh()
        _, m_shard = step(state, shard_batch(batch, mesh))
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-5
        )


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        state, _ = step(state, tiny_batch(rng))
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state)

        fresh = create_train_state(model, jax.random.PRNGKey(1), jnp.zeros((2, 32, 32, 3)))
        restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == 1
        l1 = jax.tree.leaves(state.params)
        l2 = jax.tree.leaves(restored.params)
        for a, b in zip(l1, l2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("donate", [False, True])
    @pytest.mark.slow
    def test_restore_bookkeeping_stays_on_host(self, rng, tmp_path, donate):
        """epoch/step restore as numpy so resume arithmetic never needs a
        device readback (a D2H of freshly restored buffers can block on the
        remote-TPU tunnel; on any backend it is a pointless sync), and the
        host scalars must still feed the next jitted step.

        donate=True covers the production default (make_train_step donates
        the state): the first post-resume step feeds numpy epoch/step leaves
        into donated argnums — JAX must accept them (it skips donation for
        non-device buffers) and the step must still advance."""
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=donate)
        state, _ = step(state, tiny_batch(rng))
        path = str(tmp_path / "ckpt_host")
        save_checkpoint(path, state)

        fresh = create_train_state(model, jax.random.PRNGKey(1), jnp.zeros((2, 32, 32, 3)))
        restored = restore_checkpoint(path, fresh)
        assert isinstance(restored.epoch, np.ndarray)
        assert isinstance(restored.step, np.ndarray)
        assert restored.step.dtype == np.asarray(fresh.step).dtype
        assert int(restored.step) == 1
        # The host scalars must round-trip back into the jitted step.
        resumed, _ = step(restored, tiny_batch(rng))
        assert int(resumed.step) == 2

    def test_shape_filtered_restore(self):
        donor = {"a": np.ones((3, 3)), "b": np.ones((2,)), "c": np.ones((5,))}
        target = {"a": np.zeros((3, 3)), "b": np.zeros((4,)), "d": np.zeros((1,))}
        out = shape_filtered_restore(donor, target)
        np.testing.assert_array_equal(out["a"], np.ones((3, 3)))  # shape match: copied
        np.testing.assert_array_equal(out["b"], np.zeros((4,)))  # mismatch: kept
        np.testing.assert_array_equal(out["d"], np.zeros((1,)))  # absent: kept

    @pytest.mark.slow
    def test_maybe_resume_fine_tune(self, rng, tmp_path):
        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        for _ in range(3):
            state, _ = step(state, tiny_batch(rng))
        path = str(tmp_path / "donor")
        save_checkpoint(path, state)

        # Fine-tune into a model with a different stage-3 head (5 -> 7 ch).
        model2 = ProgressiveHourglass(out_channels=(2, 4, 7), **TINY)
        fresh = create_train_state(model2, jax.random.PRNGKey(9), jnp.zeros((2, 32, 32, 3)))
        warm = maybe_resume(path, fresh, fine_tune=True)
        assert int(warm.epoch) == 0  # fine-tune restarts epochs
        # Matching tensors copied from donor...
        d = np.asarray(
            state.params["preprocess1"]["conv1"]["conv"]["kernel"]
        )
        w = np.asarray(warm.params["preprocess1"]["conv1"]["conv"]["kernel"])
        np.testing.assert_array_equal(d, w)
        # ...mismatched head kept fresh.
        f = np.asarray(fresh.params["stage3_out"]["conv"]["kernel"])
        w3 = np.asarray(warm.params["stage3_out"]["conv"]["kernel"])
        np.testing.assert_array_equal(f, w3)


class TestRemat:
    """remat=True must change only memory behaviour: identical outputs,
    gradients (to fp tolerance), and BN batch-stat updates."""

    @pytest.mark.parametrize("family", ["recursive", "progressive"])
    @pytest.mark.slow
    def test_grads_match_no_remat(self, rng, family):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            StackedHourglass,
        )

        x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        if family == "recursive":
            mk = lambda **kw: StackedHourglass(
                n_stack=2, out_channels=6, features=16, hourglass_depth=2,
                dtype=jnp.float32, **kw,
            )
        else:
            mk = lambda **kw: ProgressiveHourglass(out_channels=(2, 4, 5), **TINY, **kw)
        m0, m1 = mk(), mk(remat=True)
        v = m0.init(jax.random.PRNGKey(0), x)

        def loss(model, params):
            outs, upd = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                mutable=["batch_stats"],
            )
            return sum(o.astype(jnp.float32).sum() for o in outs), upd

        (l0, u0), g0 = jax.value_and_grad(lambda p: loss(m0, p), has_aux=True)(v["params"])
        (l1, u1), g1 = jax.value_and_grad(lambda p: loss(m1, p), has_aux=True)(v["params"])
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
        for a, b in zip(jax.tree.leaves(u0), jax.tree.leaves(u1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


class TestAsyncCheckpoint:
    @pytest.mark.slow
    def test_async_save_roundtrip(self, rng, tmp_path):
        from progressive_process_for_human_pose_estimation_tpu.train import (
            load_loss_history,
            wait_for_checkpoints,
        )

        model = tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(model, progressive_objective, donate=False)
        state, _ = step(state, tiny_batch(rng))
        path = str(tmp_path / "ckpt_async")
        save_checkpoint(path, state, loss_history={"loss": [1.0, 0.5]},
                        async_save=True)
        wait_for_checkpoints()
        fresh = create_train_state(model, jax.random.PRNGKey(7), jnp.zeros((2, 32, 32, 3)))
        restored = restore_checkpoint(path, fresh)
        a = np.asarray(jax.tree.leaves(state.params)[0])
        b = np.asarray(jax.tree.leaves(restored.params)[0])
        np.testing.assert_array_equal(a, b)
        assert load_loss_history(path)["loss"] == [1.0, 0.5]


class TestDonationGate:
    def test_donation_supported_on_cpu(self):
        # CPU test backend is not the axon tunnel -> donation is safe.
        from progressive_process_for_human_pose_estimation_tpu.train import (
            donation_supported,
        )

        assert donation_supported() is True


class TestLogCadence:
    @pytest.mark.slow
    def test_fit_epoch_logs_on_global_step(self, rng):
        """The log/readback cadence is measured on the GLOBAL step: at 2
        steps/epoch with log_every=4 the callback fires every other epoch,
        not at i=0 of every epoch (the old within-epoch rule forced one
        blocking device_get per epoch, serializing the remote-TPU tunnel)."""
        from progressive_process_for_human_pose_estimation_tpu.train import fit_epoch

        model = tiny_model()
        batch = tiny_batch(rng)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["image"])
        step = make_train_step(model, progressive_objective, donate=False)

        fired = []
        key = jax.random.PRNGKey(0)
        for epoch in range(4):
            state, _, key = fit_epoch(
                step, state, [batch, batch], log_every=4,
                log_fn=lambda i, m, e=epoch: fired.append(2 * e + i),
                key=key, step_offset=2 * epoch,
            )
        assert fired == [0, 4]
