"""Every config.EXPERIMENTS entry must construct its model + objective and
survive one train step on schema-correct tiny data (the round-1 registry was
dead code with a latent IndexError — this pins it working)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressive_process_for_human_pose_estimation_tpu.config import EXPERIMENTS
from progressive_process_for_human_pose_estimation_tpu.data import (
    HostLoader,
    make_render_fn,
    synthetic_coco_manifest,
    synthetic_mpii_manifest,
)
from progressive_process_for_human_pose_estimation_tpu.models import build_model
from progressive_process_for_human_pose_estimation_tpu.train import (
    create_train_state,
    make_train_step,
)
from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
    OBJECTIVES,
)

SIZE = 64  # smallest input supporting the presets' default hourglass depth 4


def render_batch(dataset: str, batch: int = 2):
    if dataset in ("mpii", "lsp"):
        manifest = synthetic_mpii_manifest(n_images=batch, img_size=SIZE)
    else:
        manifest = synthetic_coco_manifest(n_images=batch, img_size=SIZE)
    render = make_render_fn(manifest, inputsize=SIZE, augment=False,
                            render_gauss=True)
    loader = HostLoader(manifest, batch_size=batch, shuffle=False,
                        staging_size=render.staging_size)
    return dict(render(jax.random.PRNGKey(0), next(iter(loader))))


@pytest.mark.parametrize("name", sorted(EXPERIMENTS))
def test_experiment_one_step(name):
    cfg = EXPERIMENTS[name]
    model = build_model(cfg.model_preset, features=32, dtype=jnp.float32)
    objective = OBJECTIVES[cfg.objective]

    batch = render_batch(cfg.dataset)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["image"], cfg.learning_rate
    )
    step = make_train_step(model, objective, donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
