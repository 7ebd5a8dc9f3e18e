"""Model zoo + preset registry.

Each preset corresponds to a reference experiment script (the reference's
per-script copy-paste evolution becomes configuration here; BASELINE.json's
five configs map onto these presets).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from .aspp_recursive import ProgressiveRecursiveASPP  # noqa: F401
from .classic import ClassicStackedHourglass  # noqa: F401
from .gated import GatedRecursiveProgressive  # noqa: F401
from .progressive import (  # noqa: F401
    MaskNet,
    ProgressiveHourglass,
    StageSequentialProgressive,
    Stem,
)
from .recursive import (  # noqa: F401
    COCO_SKELETON,
    MPII_SKELETON,
    RefinerD,
    StackedHourglass,
    TwoStackProgressive,
)

# Reference channel constants (/root/reference/train.py:42-48).
N_KEYPOINT_COCO = 17
N_SKELETON_COCO = 19
N_KEYPOINT_MPII = 16
N_SKELETON_MPII = 15


def _preset(cls, **defaults):
    """Preset factory: hard-coded defaults merged under caller overrides, so
    flags like --out-channels can re-head any preset (e.g. LSP's 14 joints)."""

    def make(**kw):
        return cls(**{**defaults, **kw})

    return make


def _presets() -> Dict[str, Callable[..., Any]]:
    return {
        # Final progressive model, MPII config (/root/reference/train.py:545-601).
        "progressive_mpii": _preset(
            ProgressiveHourglass,
            out_channels=(2, N_SKELETON_MPII + 1, N_KEYPOINT_MPII + 1),
        ),
        # Final (train.py) progressive model re-headed with COCO channel
        # counts for the CE objectives (2 / nSkeleton+1 / nKeypoint+1 —
        # keypoint CE needs the +1 background class). NOTE: this is OUR
        # extension for COCO-schema demos; the reference's own COCO-lineage
        # scripts (try_costomer_loss.py:37-39,
        # try_with_aspp_remove_max_pool.py:36-38) use the cat-merge family
        # with 17-ch MSE keypoint heads — presets 'gated_progressive' /
        # 'progressive_no_maxpool' below.
        "progressive_coco": _preset(
            ProgressiveHourglass,
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO + 1),
        ),
        # BASELINE config 2: 2-stack progressive with intermediate supervision
        # (/root/reference/try_different_stack_without_skeleton.py:281-328):
        # weight-shared maxpool/add recursive hourglass, bias-free per-stack
        # heads (2 bg / 17 keypoint-MSE), return conv4_0(cat[ll, out0]).
        "progressive_2stage": _preset(
            TwoStackProgressive, out_channels=(2, N_KEYPOINT_COCO)
        ),
        # Hard input-masking ablation
        # (/root/reference/try_remove_background_and_costomer_loss.py:311-362):
        # unshared cat-merge hourglass + residual per stage; stage-3 head is
        # 17-ch masked-MSE on Gaussians (no background class).
        "stage_sequential": _preset(
            StageSequentialProgressive,
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO),
        ),
        # Classic Newell 4-stack baseline
        # (/root/reference/hourglass_compare.py:546-638).
        "classic_baseline": _preset(
            ClassicStackedHourglass, n_stack=4, out_channels=N_KEYPOINT_MPII
        ),
        # BASELINE config 1: single-stack hourglass
        # (/root/reference/only_one_hourgless.py:215-254; nOutChannels = 18 =
        # 17 COCO keypoints + background, line 22; trained on COCO2014 with
        # integer-class point labels + CE).
        "only_one_hourglass": _preset(
            StackedHourglass, n_stack=1, out_channels=N_KEYPOINT_COCO + 1
        ),
        # 4-stack recursive hourglass with COCO Gaussian heads
        # (/root/reference/try_with_torch.py:246-298).
        "recursive_4stack_coco": _preset(
            StackedHourglass, n_stack=4, out_channels=N_KEYPOINT_COCO
        ),
        # BASELINE config 3 + headline bench model: 8-stack hourglass with the
        # joint 38-ch skeleton+keypoint merged output
        # (/root/reference/try_skeleton_and_keypoints.py:270-298, scaled to 8
        # stacks per BASELINE.json).
        "hourglass8_skeleton": _preset(
            StackedHourglass,
            n_stack=8,
            out_channels=38,
            variant="skeleton_merge",
            skeleton=COCO_SKELETON,
        ),
        # Gated cat-merge progressive (argmax-mask feature gating,
        # /root/reference/try_costomer_loss.py:284-330; 17-ch MSE keypoint
        # stage).
        "gated_progressive": _preset(
            GatedRecursiveProgressive,
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO),
        ),
        # BASELINE config 4: the same cat-merge model WITHOUT the gate —
        # "remove max pool" (/root/reference/try_with_aspp_remove_max_pool
        # .py:262-301): stage-0 logits join the first feature return.
        "progressive_no_maxpool": _preset(
            GatedRecursiveProgressive,
            gate_stage0=False,
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO),
        ),
        # Derived-skeleton variant
        # (/root/reference/try_skeleton_from_keypoints.py:265-283).
        "skeleton_from_keypoints": _preset(
            StackedHourglass,
            n_stack=4,
            out_channels=N_KEYPOINT_COCO + 1,
            variant="skeleton_from_keypoints",
            skeleton=COCO_SKELETON,
        ),
        # Recursive-hourglass progressive, 3 stacks
        # (/root/reference/try_with_aspp.py:283-331 — its hourglass
        # constructs ASPP modules that the forward never calls, so the
        # innermost level is a pass-through).
        # The FIRST true progressive 3-stage model
        # (/root/reference/try_different_stack.py:281-329): same family,
        # innermost level = n_modules more residuals.
        "progressive_3stage": _preset(
            ProgressiveRecursiveASPP,
            n_stack=3,
            bottleneck="modules",
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO),
        ),
        "progressive_aspp_recursive": _preset(
            ProgressiveRecursiveASPP,
            n_stack=3,
            bottleneck="identity",
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO),
        ),
        # Same family, 4 stacks with the "stages >= 2 all emit keypoints"
        # head rule (/root/reference/try_more_layer.py:315-363).
        "progressive_more_layer": _preset(
            ProgressiveRecursiveASPP,
            n_stack=4,
            out_channels=(2, N_SKELETON_COCO + 1, N_KEYPOINT_COCO),
        ),
        # Person/background mask network (/root/reference/train.py:604-622).
        "masknet": _preset(MaskNet),
        # 64x64 refinement hourglass ``creatModelD``
        # (/root/reference/only_one_hourgless.py:257-283; Keras original
        # model.py:121-143): input = concat[base-model heatmaps,
        # /4-downsampled image], output = refined heatmaps. The reference
        # never trains it (and the torch forward is unrunnable as written,
        # line 280); the completed workflow here follows the Keras lineage —
        # Gaussian heatmap channels refined with MSE (model.py's
        # DataGenerator yields per-joint Gaussians). Override
        # ``--out-channels 18`` + ``--objective single_stack_ce`` for the
        # class-map lineage (only_one_hourgless.py:22 uses nOutChannels=18).
        "refiner": _preset(RefinerD, out_channels=N_KEYPOINT_COCO),
    }


PRESETS = _presets()


def build_model(name: str, *, dtype=jnp.bfloat16, param_dtype=jnp.float32, **overrides):
    """Instantiate a preset model. Extra kwargs override module attributes."""
    if name not in PRESETS:
        raise KeyError(f"unknown model preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name](dtype=dtype, param_dtype=param_dtype, **overrides)
