"""Experiment presets: one config per reference experiment (BASELINE.json).

The reference configures experiments by hand-editing module constants per
script (/root/reference/train.py:39-97). Here each experiment is a frozen
dataclass bundling the model preset, training objective, and data settings —
the five BASELINE.json configs map 1:1 onto entries in :data:`EXPERIMENTS`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model_preset: str
    objective: str
    dataset: str  # 'mpii' | 'coco' | 'lsp' | 'synthetic'
    input_size: int = 256
    batch_size: int = 48          # train.py:50
    learning_rate: float = 1e-4   # train.py:54
    epochs: int = 300             # train.py:49
    augment: bool = True
    # Adam epsilon. Only train.py:834 and hourglass_compare.py:885 pass the
    # unusual eps=1e-4; every try_* script uses torch.optim.Adam's default
    # 1e-8 (e.g. try_skeleton_and_keypoints.py:407, try_costomer_loss.py:357).
    # eps=1e-4 caps the effective per-parameter step at lr*g/1e-4 once
    # |grad| < 1e-4, which stalls small-gradient training — so applying it
    # to the try_*-derived presets is both unfaithful and harmful.
    adam_eps: float = 1e-8
    # Test-time BatchNorm mode. Only train.py:991, hourglass_compare.py:1044
    # and performance_compare.py:619-620 call .eval() before inference; NO
    # try_* script does (verified: `grep -n '.eval()' /root/reference/*.py`),
    # so their test branches run torch modules in train mode — BN normalizes
    # by the CURRENT batch statistics. That is load-bearing for the try_*
    # models because they share one BN instance across stacks
    # (only_one_hourgless.py:224-253): a single running-stat EMA averaged
    # over 8 stacks' different feature distributions normalizes none of them
    # correctly (measured: hourglass8_skeleton converged to train-BN loss
    # 1.66 but eval-BN loss 6.8 and PCKh 0%). True = evaluate with batch
    # stats (the try_* behavior); False = running averages (.eval()).
    eval_batch_stats: bool = True
    notes: str = ""


EXPERIMENTS = {
    # BASELINE config 1: "Single-hourglass 256x256 MPII inference, 16-joint
    # heatmaps (only_one_hourgless.py)".
    "only_one_hourglass": ExperimentConfig(
        name="only_one_hourglass",
        model_preset="only_one_hourglass",
        objective="single_stack_ce",
        dataset="coco",
        batch_size=16,
        augment=False,
        notes="single weight-shared stack; CE on integer class point maps "
              "(18 ch = 17 COCO keypoints + bg, only_one_hourgless.py:22)",
    ),
    # BASELINE config 2: "2-stack progressive hourglass with intermediate
    # supervision (try_different_stack)".
    "progressive_2stage": ExperimentConfig(
        name="progressive_2stage",
        model_preset="progressive_2stage",
        objective="progressive_2stage",
        dataset="coco",
        notes="bg mask stage (CE) + 17-ch keypoint stage (MSE on Gaussians)",
    ),
    # BASELINE config 3: "8-stack hourglass + skeleton-branch custom loss
    # (try_skeleton_and_keypoints)" — the flagship/bench model.
    "hourglass8_skeleton": ExperimentConfig(
        name="hourglass8_skeleton",
        model_preset="hourglass8_skeleton",
        objective="split_channel",
        dataset="coco",
        notes="38-ch joint output, dual CE over the 18/20 channel split",
    ),
    # BASELINE config 4: "ASPP/dilated-conv hourglass, max-pool removed
    # (try_with_aspp_remove_max_pool)".
    "aspp_no_maxpool": ExperimentConfig(
        name="aspp_no_maxpool",
        model_preset="progressive_no_maxpool",
        objective="progressive_ce_ce_mse",
        dataset="coco",
        notes="cat-merge hourglass, stride-2 residual downsampling (no "
              "maxpool; the file's ASPP modules are dead code); CE bg + CE "
              "skeleton + MSE keypoint Gaussians "
              "(try_with_aspp_remove_max_pool.py:262-317)",
    ),
    # BASELINE config 5: "COCO 17-keypoint full train+eval with augmentation
    # + background removal".
    "coco_full": ExperimentConfig(
        name="coco_full",
        model_preset="stage_sequential",
        objective="masked",
        dataset="coco",
        notes="predicted-mask-gated features + mask-weighted losses",
    ),
    # Recursive-ASPP 3-stack progressive (try_with_aspp).
    "with_aspp": ExperimentConfig(
        name="with_aspp",
        model_preset="progressive_aspp_recursive",
        objective="progressive_ce_ce_mse",
        dataset="coco",
        batch_size=8,
        notes="weight-shared recursive hourglass, ASPP bottleneck; "
              "CE bg + CE skeleton + MSE keypoint Gaussians",
    ),
    # Recursive-ASPP 4-stack with stages >= 2 keypoint heads (try_more_layer).
    "more_layer": ExperimentConfig(
        name="more_layer",
        model_preset="progressive_more_layer",
        objective="progressive_ce_ce_mse",
        dataset="coco",
        batch_size=8,
        notes="4 stacks; stages >= 2 share the keypoint head "
              "(try_more_layer.py:359); stack 3 unsupervised",
    ),
    # The reference's final published model (train.py as committed).
    "progressive_mpii_final": ExperimentConfig(
        name="progressive_mpii_final",
        model_preset="progressive_mpii",
        objective="progressive",
        dataset="mpii",
        adam_eps=1e-4,  # train.py:834
        eval_batch_stats=False,  # train.py:991 calls .eval()
        notes="annealed OHEM-CE + CE on skeleton/keypoint stages "
              "(background stage unsupervised, as in train.py:886-890)",
    ),
    # Fair-comparison baseline (hourglass_compare.py).
    "classic_baseline": ExperimentConfig(
        name="classic_baseline",
        model_preset="classic_baseline",
        objective="classic_mse",
        dataset="mpii",
        adam_eps=1e-4,  # hourglass_compare.py:885
        eval_batch_stats=False,  # hourglass_compare.py:1044 calls .eval()
        notes="4-stack Newell baseline, per-stack MSE on Gaussian maps",
    ),
    # The first true progressive 3-stage model (try_different_stack.py).
    "different_stack": ExperimentConfig(
        name="different_stack",
        model_preset="progressive_3stage",
        objective="progressive_ce_ce_mse",
        dataset="coco",
        batch_size=16,
        notes="3-stage add-merge recursive hourglass; CE bg + CE skeleton + "
              "MSE keypoint Gaussians (try_different_stack.py:281-329, "
              "388-391); optional dense-CRF refinement at eval",
    ),
    # OHEM custom-loss experiment (try_costomer_loss.py).
    "costomer_loss": ExperimentConfig(
        name="costomer_loss",
        model_preset="gated_progressive",
        objective="ohem_ce_ce_mse",
        dataset="coco",
        batch_size=16,
        notes="gated cat-merge model; fixed-0.25 OHEM CE (bg + skeleton, "
              "per-sample top-k mean summed over batch) + MSE Gaussians "
              "(try_costomer_loss.py:341-343, 387-390)",
    ),
    # 64x64 refinement hourglass creatModelD (only_one_hourgless.py:257-283;
    # Keras original model.py:121-143). The reference defines it twice but
    # never trains it; this completes the workflow: train with
    # `cli.train --experiment refiner --refine-base recursive_4stack_coco
    # [--refine-base-load <ckpt>]`, use with `cli.predict --refine
    # --refine-load <ckpt>`.
    "refiner": ExperimentConfig(
        name="refiner",
        model_preset="refiner",
        objective="refine_mse",
        dataset="coco",
        batch_size=16,  # only_one_hourgless.py:24
        epochs=1000,    # only_one_hourgless.py:23
        augment=False,
        notes="RefinerD on concat[frozen base heatmaps, /4 image]; MSE vs "
              "keypoint Gaussians (the Keras DataGenerator's targets, "
              "model.py:190-210)",
    ),
    # Plain-CE ablation of the same gated model (try_remove_background.py).
    "remove_background": ExperimentConfig(
        name="remove_background",
        model_preset="gated_progressive",
        objective="progressive_ce_ce_mse",
        dataset="coco",
        batch_size=16,
        notes="same gated cat-merge model, plain CE/CE/MSE losses "
              "(try_remove_background.py:324-326, 370-372)",
    ),
}
