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


@pytest.mark.slow  # full hourglass-depth models; ~10 min across the registry
@pytest.mark.parametrize("name", sorted(EXPERIMENTS))
def test_experiment_one_step(name):
    cfg = EXPERIMENTS[name]
    model = build_model(cfg.model_preset, features=32, dtype=jnp.float32)
    objective = OBJECTIVES[cfg.objective]

    batch = render_batch(cfg.dataset)
    if name == "refiner":
        # The refiner consumes the composed concat[base heatmaps, /4 image]
        # built by cli.train --refine-base (creatModelD's nOutChannels+3
        # input, only_one_hourgless.py:259); stand in zero heatmaps here —
        # the full composition is covered by tests/test_cli.py's
        # TestRefinerWorkflow.
        n = batch["image"].shape[0]
        small = jax.image.resize(batch["image"], (n, SIZE // 4, SIZE // 4, 3),
                                 "bilinear")
        hm = jnp.zeros((n, SIZE // 4, SIZE // 4, model.out_channels))
        batch["image"] = jnp.concatenate([hm, small], axis=-1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["image"], cfg.learning_rate,
        eps=cfg.adam_eps,
    )
    step = make_train_step(model, objective, donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_adam_eps_provenance():
    """Only the train.py / hourglass_compare.py presets use eps=1e-4
    (train.py:834, hourglass_compare.py:885); every try_*-derived preset
    uses torch.optim.Adam's default 1e-8 (try_skeleton_and_keypoints.py:407,
    try_costomer_loss.py:357, ...). eps=1e-4 stalls small-gradient training,
    so leaking it into the try_* presets is a convergence bug, not a nit."""
    big_eps = {"progressive_mpii_final", "classic_baseline"}
    for name, cfg in EXPERIMENTS.items():
        expected = 1e-4 if name in big_eps else 1e-8
        assert cfg.adam_eps == expected, (name, cfg.adam_eps)


def test_resolve_experiment_fills_adam_eps():
    import argparse

    from cli.common import resolve_experiment

    args = argparse.Namespace(experiment="hourglass8_skeleton", adam_eps=None)
    resolve_experiment(args)
    assert args.adam_eps == 1e-8

    args = argparse.Namespace(experiment="classic_baseline", adam_eps=None)
    resolve_experiment(args)
    assert args.adam_eps == 1e-4

    # explicit flag wins
    args = argparse.Namespace(experiment="classic_baseline", adam_eps=3e-7)
    resolve_experiment(args)
    assert args.adam_eps == 3e-7
