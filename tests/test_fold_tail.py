"""fold_tail: the inference-only tail fold must match the unfolded model.

For every NON-final stack the chain head(conv2) → merge → conv4 plus conv3
is linear in ``ll``, so StackedHourglass(fold_tail=True) collapses it into
one f→f affine (models/recursive.py). These tests pin: (a) the folded final
output equals the unfolded model's final output (same variables), (b) the
param tree is identical with the fold on or off (checkpoint compatibility),
(c) the guards (scan_stacks, training mode) raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressive_process_for_human_pose_estimation_tpu.models import (
    COCO_SKELETON,
    StackedHourglass,
)

SMALL = dict(features=32, hourglass_depth=2, n_modules=1, n_stack=3)


def _build(variant, share, **kw):
    out_c = 36 if variant == "skeleton_merge" else 18
    return StackedHourglass(
        out_channels=out_c,
        variant=variant,
        skeleton=COCO_SKELETON if variant != "plain" else None,
        share_weights=share,
        use_running_average=True,
        **SMALL,
        **kw,
    )


@pytest.mark.parametrize("share", [True, False])
@pytest.mark.parametrize(
    "variant",
    ["plain", "skeleton_merge", "skeleton_from_keypoints",
     "skeleton_from_keypoints_merge"],
)
def test_fold_matches_unfolded(variant, share):
    base = _build(variant, share)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)

    ref = base.apply(variables, x)
    folded = _build(variant, share, fold_tail=True).apply(variables, x)

    assert len(ref) == SMALL["n_stack"]
    assert len(folded) == 1  # only the final stack's output is produced
    np.testing.assert_allclose(
        np.asarray(folded[-1], np.float32),
        np.asarray(ref[-1], np.float32),
        rtol=2e-4,
        atol=2e-4,
    )


def test_fold_param_tree_identical():
    base = _build("skeleton_merge", True)
    fold = _build("skeleton_merge", True, fold_tail=True)
    x = jnp.zeros((1, 64, 64, 3))
    tb = jax.tree_util.tree_structure(base.init(jax.random.PRNGKey(0), x))
    tf = jax.tree_util.tree_structure(fold.init(jax.random.PRNGKey(0), x))
    assert tb == tf


def test_progressive_fold_matches_unfolded():
    from progressive_process_for_human_pose_estimation_tpu.models import (
        ProgressiveHourglass,
    )

    kw = dict(features=32, hourglass_depth=2, out_channels=(2, 16, 17),
              use_running_average=True)
    base = ProgressiveHourglass(**kw)
    fold = ProgressiveHourglass(fold_tail=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)

    ref = base.apply(variables, x)
    folded = fold.apply(variables, x)
    assert len(ref) == 3 and len(folded) == 1
    np.testing.assert_allclose(
        np.asarray(folded[-1], np.float32),
        np.asarray(ref[-1], np.float32),
        rtol=2e-4,
        atol=2e-4,
    )
    tb = jax.tree_util.tree_structure(variables)
    tf = jax.tree_util.tree_structure(fold.init(jax.random.PRNGKey(0), x))
    assert tb == tf


def test_progressive_fold_training_guard():
    from progressive_process_for_human_pose_estimation_tpu.models import (
        ProgressiveHourglass,
    )

    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="inference-only"):
        ProgressiveHourglass(
            features=32, hourglass_depth=2, fold_tail=True
        ).init(jax.random.PRNGKey(0), x)


@pytest.mark.slow
def test_cli_evaluate_fold_matches():
    """cli.evaluate --fold must print the exact same curve as the unfolded
    eval (same untrained weights, same synthetic split)."""
    from cli import evaluate

    common = [
        "--preset", "hourglass8_skeleton",
        "--dataset", "synthetic", "--n-synthetic", "4", "--batch-size", "2",
        "--input-size", "64", "--features", "32", "--hourglass-depth", "2",
        "--dtype", "float32",
        # The fold requires running-stat BN; pin BOTH sides to it (the bare
        # preset otherwise infers the experiment's faithful batch-stat mode,
        # which --fold refuses).
        "--eval-bn", "running",
    ]
    ref = evaluate.main(common)
    fold = evaluate.main(common + ["--fold"])
    np.testing.assert_allclose(fold, ref, atol=1e-6)


def test_fold_guards():
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="scan_stacks"):
        StackedHourglass(
            fold_tail=True, scan_stacks=True, use_running_average=True, **SMALL
        ).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="inference-only"):
        StackedHourglass(fold_tail=True, **SMALL).init(jax.random.PRNGKey(0), x)
