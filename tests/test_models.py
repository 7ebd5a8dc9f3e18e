"""Shape/structure tests for the model zoo (small configs for speed)."""

import jax
import jax.numpy as jnp
import pytest

from progressive_process_for_human_pose_estimation_tpu.models import (
    PRESETS,
    ClassicStackedHourglass,
    MaskNet,
    ProgressiveHourglass,
    RefinerD,
    StackedHourglass,
    build_model,
)

SMALL = dict(features=32, hourglass_depth=2, dtype=jnp.float32)


def init_apply(model, x):
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, mutable=["batch_stats"])
    return out, variables


class TestProgressive:
    def test_three_stage_outputs(self):
        x = jnp.zeros((1, 64, 64, 3))
        model = ProgressiveHourglass(out_channels=(2, 16, 17), **SMALL)
        outs, _ = init_apply(model, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 2),
            (1, 16, 16, 16),
            (1, 16, 16, 17),
        ]

    def test_two_stage(self):
        x = jnp.zeros((1, 64, 64, 3))
        outs, _ = init_apply(ProgressiveHourglass(out_channels=(2, 17), **SMALL), x)
        assert [o.shape[-1] for o in outs] == [2, 17]

    def test_masknet(self):
        x = jnp.zeros((1, 64, 64, 3))
        out, _ = init_apply(MaskNet(**SMALL), x)
        assert out.shape == (1, 16, 16, 2)


class TestClassic:
    def test_four_stack(self):
        x = jnp.zeros((1, 64, 64, 3))
        model = ClassicStackedHourglass(n_stack=2, out_channels=16, **SMALL)
        outs, _ = init_apply(model, x)
        assert [o.shape for o in outs] == [(1, 16, 16, 16)] * 2


class TestRecursive:
    def test_single_stack(self):
        x = jnp.zeros((1, 64, 64, 3))
        model = StackedHourglass(n_stack=1, out_channels=16, **SMALL)
        outs, _ = init_apply(model, x)
        assert [o.shape for o in outs] == [(1, 16, 16, 16)]

    def test_weight_sharing_reduces_params(self):
        x = jnp.zeros((1, 64, 64, 3))
        shared = StackedHourglass(n_stack=2, out_channels=8, share_weights=True, **SMALL)
        unshared = StackedHourglass(n_stack=2, out_channels=8, share_weights=False, **SMALL)
        n_shared = sum(
            p.size for p in jax.tree.leaves(shared.init(jax.random.PRNGKey(0), x)["params"])
        )
        n_unshared = sum(
            p.size for p in jax.tree.leaves(unshared.init(jax.random.PRNGKey(0), x)["params"])
        )
        assert n_shared < n_unshared

    def test_skeleton_from_keypoints_channels(self):
        import numpy as np

        sks = np.array([[0, 1], [1, 2]], dtype=np.int32)
        x = jnp.zeros((1, 64, 64, 3))
        model = StackedHourglass(
            n_stack=2,
            out_channels=18,
            variant="skeleton_from_keypoints",
            skeleton=sks,
            **SMALL,
        )
        outs, _ = init_apply(model, x)
        # 18 keypoint channels + 2 derived skeleton channels.
        assert all(o.shape[-1] == 20 for o in outs)

    def test_skeleton_merge_channels(self):
        import numpy as np

        sks = np.array([[1, 2], [3, 4]], dtype=np.int32)
        x = jnp.zeros((1, 64, 64, 3))
        model = StackedHourglass(
            n_stack=1, out_channels=38, variant="skeleton_merge", skeleton=sks, **SMALL
        )
        outs, _ = init_apply(model, x)
        assert outs[0].shape[-1] == 38

    def test_refiner(self):
        x = jnp.zeros((1, 32, 32, 20))
        out, _ = init_apply(RefinerD(out_channels=17, **SMALL), x)
        # RefinerD has no downsampling stem (3x3 stride-1 conv,
        # /root/reference/only_one_hourgless.py:259): output keeps input res.
        assert out.shape == (1, 32, 32, 17)


class TestRegistry:
    @pytest.mark.parametrize("name", sorted(PRESETS))
    def test_presets_buildable(self, name):
        model = build_model(name, dtype=jnp.float32)
        assert model is not None


class TestFusedEval:
    @pytest.mark.slow
    def test_fused_eval_matches_plain(self):
        """fused_eval swaps the 8²-16² residuals for the Pallas kernel
        (interpret mode on CPU); outputs must match the plain eval path to
        folded-BN tolerance with an identical parameter pytree."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from progressive_process_for_human_pose_estimation_tpu.models import (
            StackedHourglass,
        )

        kw = dict(n_stack=2, out_channels=8, features=16, hourglass_depth=2,
                  use_running_average=True, dtype=jnp.float32)
        plain = StackedHourglass(**kw)
        fused = StackedHourglass(fused_eval=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
        v = plain.init(jax.random.PRNGKey(0), x)
        ref = plain.apply(v, x)
        out = fused.apply(v, x)  # same variables: pytree is unchanged
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
