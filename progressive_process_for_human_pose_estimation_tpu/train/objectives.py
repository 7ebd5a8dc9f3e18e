"""Per-preset training objectives — the reference's loss wirings as pure fns.

Each objective maps ``(outputs, batch, epoch) -> (total_loss, metrics)``
where ``outputs`` is the model's list of per-stage NHWC logits and ``batch``
a dict of targets. Wirings covered (one per reference experiment family):

- :func:`progressive_objective` — the final model's loss
  (/root/reference/train.py:887-890): annealed OHEM-CE + plain CE on the
  skeleton stage and the keypoint stage; the stage-1 background loss is kept
  available but OFF by default (the reference commented it out,
  train.py:886-889).
- :func:`classic_mse_objective` — per-stack MSE on Gaussian maps
  (/root/reference/hourglass_compare.py:936-941, try_with_torch.py:333-341).
- :func:`single_stack_ce_objective` — CE on the one output
  (/root/reference/only_one_hourgless.py:366-374).
- :func:`split_channel_objective` — dual CE over keypoint/skeleton channel
  split on every stack (/root/reference/try_skeleton_and_keypoints.py:423-435).
- :func:`masked_objective` — predicted-mask-weighted CE/MSE
  (/root/reference/try_remove_background_and_costomer_loss.py:419-421).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..losses import (
    ce_loss,
    combined_ohem_ce_loss,
    masked_ce_loss,
    masked_mse_loss,
    mse_loss,
    ohem_ce_loss,
    split_channel_ce_loss,
)


def progressive_objective(
    outputs: List[jax.Array],
    batch: Dict[str, jax.Array],
    epoch: jax.Array,
    include_background: bool = False,
    ohem_floor: float = 0.1,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """train.py's objective: fraction = (100 - epoch)/100, floored."""
    fraction = (100.0 - epoch.astype(jnp.float32)) / 100.0
    loss_2 = combined_ohem_ce_loss(outputs[1], batch["skeleton_map"], fraction, ohem_floor)
    loss_3 = combined_ohem_ce_loss(outputs[2], batch["keypoint_map"], fraction, ohem_floor)
    metrics = {"loss_2": loss_2, "loss_3": loss_3}
    total = loss_2 + loss_3
    if include_background:
        loss_1 = combined_ohem_ce_loss(
            outputs[0], batch["background_map"], fraction, ohem_floor
        )
        metrics["loss_1"] = loss_1
        total = total + loss_1
    metrics["loss"] = total
    return total, metrics


def classic_mse_objective(outputs, batch, epoch):
    """Per-stack MSE vs Gaussian heatmaps (hourglass_compare.py:936-941)."""
    losses = [mse_loss(o, batch["gauss_maps"]) for o in outputs]
    total = sum(losses)
    metrics = {f"loss_stack{i}": l for i, l in enumerate(losses)}
    metrics["loss"] = total
    return total, metrics


def single_stack_ce_objective(outputs, batch, epoch):
    """CE on the single stack output (only_one_hourgless.py:370)."""
    total = ce_loss(outputs[0], batch["keypoint_map"])
    return total, {"loss": total}


def split_channel_objective(outputs, batch, epoch, split: int = 18):
    """Dual CE per stack (try_skeleton_and_keypoints.py:423-435)."""
    losses = [
        split_channel_ce_loss(o, batch["keypoint_map"], batch["skeleton_map"], split)
        for o in outputs
    ]
    total = sum(losses)
    metrics = {f"loss_stack{i}": l for i, l in enumerate(losses)}
    metrics["loss"] = total
    return total, metrics


def masked_objective(outputs, batch, epoch, ohem_floor: float = 0.25):
    """Mask-weighted losses driven by the PREDICTED stage-1 mask
    (try_remove_background_and_costomer_loss.py:373-375, 419-421): stage-1
    annealed OHEM-CE on the background map; stage-2 CE and stage-3 MSE (on
    the keypoint GAUSSIANS — loss3_keypoints is Costomer_MSELoss_with_mask
    fed by_keypoints) both weighted by argmax(stage-1), each summed per
    sample and averaged over the batch (that file's _with_mask reduction)."""
    fraction = (100.0 - epoch.astype(jnp.float32)) / 100.0
    loss_1 = combined_ohem_ce_loss(
        outputs[0], batch["background_map"], fraction, ohem_floor
    )
    pred_mask = jnp.argmax(outputs[0], axis=-1)  # (N, H, W) in {0, 1}
    loss_2 = masked_ce_loss(outputs[1], batch["skeleton_map"], pred_mask,
                            reduction="sum_mean")
    loss_3 = masked_mse_loss(outputs[2], batch["gauss_maps"], pred_mask,
                             reduction="sum_mean")
    total = loss_1 + loss_2 + loss_3
    return total, {"loss": total, "loss_1": loss_1, "loss_2": loss_2, "loss_3": loss_3}


def progressive_ce_ce_mse_objective(outputs, batch, epoch):
    """CE(bg) + CE(skeleton) + MSE(keypoint Gaussians) on the first three
    stage outputs (/root/reference/try_more_layer.py:403-406,
    try_with_aspp.py:393-396; stacks beyond 2 are unsupervised there)."""
    loss_1 = ce_loss(outputs[0], batch["background_map"])
    loss_2 = ce_loss(outputs[1], batch["skeleton_map"])
    loss_3 = mse_loss(outputs[2], batch["gauss_maps"])
    total = loss_1 + loss_2 + loss_3
    return total, {"loss": total, "loss_1": loss_1, "loss_2": loss_2,
                   "loss_3": loss_3}


def ohem_ce_ce_mse_objective(outputs, batch, epoch):
    """try_costomer_loss.py:341-343, 387-390: fixed-fraction-0.25 OHEM CE on
    the background and skeleton stages (that file's Costomer_CrossEntropyLoss
    is mean-over-kept-pixels then SUM over the batch, lines 156-169 — hence
    the xN), plain MSE on the keypoint Gaussians."""
    n = outputs[0].shape[0]
    loss_1 = ohem_ce_loss(outputs[0], batch["background_map"], 0.25) * n
    loss_2 = ohem_ce_loss(outputs[1], batch["skeleton_map"], 0.25) * n
    loss_3 = mse_loss(outputs[2], batch["gauss_maps"])
    total = loss_1 + loss_2 + loss_3
    return total, {"loss": total, "loss_1": loss_1, "loss_2": loss_2,
                   "loss_3": loss_3}


def progressive_2stage_objective(outputs, batch, epoch):
    """The 2-stage ablation (/root/reference/try_different_stack_without_skeleton.py):
    stage 1 background CE + stage 2 keypoint loss. The model emits exactly 2
    outputs (forward 296-327: conv2_0 → 2 ch, conv2_1 → nKeypoint=17 ch);
    the script's committed loss block (389-393) stale-indexes ``result[2]``
    from its 3-stage ancestor and would crash — the intended objective per
    its declared losses (loss1_background = CE, loss3_keypoints = MSE,
    360-363) is wired here: CE(out[0], background) + MSE(out[1], gauss)."""
    loss_1 = ce_loss(outputs[0], batch["background_map"])
    loss_3 = mse_loss(outputs[1], batch["gauss_maps"])
    total = loss_1 + loss_3
    return total, {"loss": total, "loss_1": loss_1, "loss_3": loss_3}


def refine_mse_objective(outputs, batch, epoch):
    """RefinerD objective — the completed ``creatModelD`` workflow. The
    reference defines the refiner twice (/root/reference/only_one_hourgless
    .py:257-283, model.py:121-143) but never trains it (and the torch
    forward is unrunnable as written, line 280); the natural objective per
    the Keras lineage is plain MSE between the refined heatmaps and the
    per-joint Gaussian targets its DataGenerator produces
    (model.py:190-210). The train driver composes the refiner's input as
    concat[frozen base-model heatmaps, /4-downsampled image]
    (``cli.train --refine-base``)."""
    total = mse_loss(outputs[0], batch["gauss_maps"])
    return total, {"loss": total}


def mask_only_objective(outputs, batch, epoch):
    """Standalone MaskNet training: CE on the person/background map — the
    reference's generateMask trainer (commented-out but complete:
    /root/reference/train.py:798-843, Adam + loss_background CE). Gives the
    `masknet` preset a real workflow feeding `cli.predict --mask-gate`."""
    loss = ce_loss(outputs[0], batch["background_map"])
    return loss, {"loss": loss}


OBJECTIVES = {
    "progressive": progressive_objective,
    "mask_only": mask_only_objective,
    "progressive_2stage": progressive_2stage_objective,
    "progressive_ce_ce_mse": progressive_ce_ce_mse_objective,
    "ohem_ce_ce_mse": ohem_ce_ce_mse_objective,
    "classic_mse": classic_mse_objective,
    # (GAUSS_CONSUMERS below lists which of these read batch["gauss_maps"].)
    "single_stack_ce": single_stack_ce_objective,
    "split_channel": split_channel_objective,
    "masked": masked_objective,
    "refine_mse": refine_mse_objective,
}

# Objectives whose loss reads batch["gauss_maps"]. Training drivers skip the
# per-sample Gaussian render (max_persons x joints x map^2 exp evaluations,
# plus transfer/sharding of the unused tensor) for every other objective.
GAUSS_CONSUMERS = frozenset(
    {"classic_mse", "progressive_2stage", "progressive_ce_ce_mse",
     "ohem_ce_ce_mse", "masked", "refine_mse"}
)
