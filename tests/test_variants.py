"""Tests for the later-added model variants and CRF refinement."""

import numpy as np

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.eval import dense_crf
from progressive_process_for_human_pose_estimation_tpu.models import (
    GatedRecursiveProgressive,
    StackedHourglass,
)

SMALL = dict(features=32, hourglass_depth=2, dtype=jnp.float32)


class TestGatedProgressive:
    def test_three_stage_shapes(self):
        x = jnp.zeros((1, 64, 64, 3))
        m = GatedRecursiveProgressive(out_channels=(2, 6, 5), **SMALL)
        v = m.init(jax.random.PRNGKey(0), x)
        outs, _ = m.apply(v, x, mutable=["batch_stats"])
        assert [o.shape[-1] for o in outs] == [2, 6, 5]
        # weight sharing: single hourglass/residual4/lin in the tree
        assert "hourglass1" in v["params"] and "hourglass_2" not in v["params"]

    def test_gating_zeroes_background(self, rng):
        # If the mask argmax is all background (0), stage-2 input features are
        # conv(0 * merged) = bias-only — check the gate actually multiplies.
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        m = GatedRecursiveProgressive(out_channels=(2, 6, 5), **SMALL)
        v = m.init(jax.random.PRNGKey(0), x)
        outs, _ = m.apply(v, x, mutable=["batch_stats"])
        assert all(bool(jnp.all(jnp.isfinite(o))) for o in outs)


class TestMergeVariant:
    def test_skeleton_from_keypoints_merge(self):
        sks = np.array([[0, 1], [1, 2]], dtype=np.int32)
        x = jnp.zeros((1, 64, 64, 3))
        m = StackedHourglass(
            n_stack=2, out_channels=18, variant="skeleton_from_keypoints_merge",
            skeleton=sks, **SMALL,
        )
        v = m.init(jax.random.PRNGKey(0), x)
        outs, _ = m.apply(v, x, mutable=["batch_stats"])
        assert all(o.shape[-1] == 20 for o in outs)
        # conv4 consumed the merged (kp + derived sk) channels
        assert v["params"]["conv4"]["conv"]["kernel"].shape[2] == 20


class TestDenseCRF:
    def test_confident_labels_stable(self, rng):
        h = w = 16
        img = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
        # strongly peaked 3-class distribution
        labels = rng.integers(0, 3, (h, w))
        probs = np.full((h, w, 3), 0.02, np.float32)
        for i in range(h):
            for j in range(w):
                probs[i, j, labels[i, j]] = 0.96
        out = np.asarray(dense_crf(img, jnp.asarray(probs), n_iters=3, radius=2))
        assert out.shape == (h, w, 3)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-4)
        # refinement keeps the dominant label in the vast majority of pixels
        agree = (out.argmax(-1) == labels).mean()
        assert agree > 0.8

    def test_smooths_salt_noise(self, rng):
        h = w = 16
        img = jnp.ones((h, w, 3), jnp.float32) * 0.5  # uniform color
        probs = np.full((h, w, 2), 0.0, np.float32)
        probs[..., 0] = 0.9
        probs[..., 1] = 0.1
        probs[8, 8] = [0.45, 0.55]  # lone noisy pixel, weak confidence
        out = np.asarray(dense_crf(img, jnp.asarray(probs), n_iters=5, radius=3))
        assert out[8, 8].argmax() == 0  # neighbours vote it back
