"""skip_nonfinite train-step guard: a NaN batch must not corrupt the state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.models import (
    ProgressiveHourglass,
)
from progressive_process_for_human_pose_estimation_tpu.train import (
    create_train_state,
    make_train_step,
)
from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
    progressive_objective,
)

TINY = dict(features=16, hourglass_depth=1, dtype=jnp.float32)


def batch(rng, poison=False):
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    if poison:
        img[0, 0, 0, 0] = np.nan
    return {
        "image": jnp.asarray(img),
        "skeleton_map": jnp.asarray(rng.integers(0, 4, (2, 8, 8))),
        "keypoint_map": jnp.asarray(rng.integers(0, 5, (2, 8, 8))),
    }


class TestNonFiniteGuard:
    def test_nan_batch_leaves_params_untouched(self, rng):
        model = ProgressiveHourglass(out_channels=(2, 4, 5), **TINY)
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(
            model, progressive_objective, donate=False, skip_nonfinite=True
        )
        before = jax.tree.map(lambda a: np.asarray(a).copy(), state.params)
        state, metrics = step(state, batch(rng, poison=True))
        assert not bool(metrics["finite"])
        after = jax.tree.leaves(state.params)
        for a, b in zip(jax.tree.leaves(before), after):
            np.testing.assert_array_equal(a, np.asarray(b))
        assert int(state.step) == 1  # counter still advances
        assert np.isfinite(jax.tree.leaves(state.params)[0]).all()

        # and a following clean batch trains normally
        state, metrics = step(state, batch(rng))
        assert bool(metrics["finite"])
        changed = any(
            np.abs(np.asarray(n) - o).max() > 0
            for n, o in zip(jax.tree.leaves(state.params), jax.tree.leaves(before))
        )
        assert changed

    @pytest.mark.slow
    def test_without_guard_nan_propagates(self, rng):
        model = ProgressiveHourglass(out_channels=(2, 4, 5), **TINY)
        state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(
            model, progressive_objective, donate=False, skip_nonfinite=False
        )
        state, metrics = step(state, batch(rng, poison=True))
        assert not bool(metrics["finite"])
        assert not np.isfinite(np.asarray(jax.tree.leaves(state.params)[0])).all()
