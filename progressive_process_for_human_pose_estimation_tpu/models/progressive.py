"""The reference's signature progressive multi-task hourglass, NHWC.

:class:`ProgressiveHourglass` rebuilds ``creatModel``
(/root/reference/train.py:545-601): a shared stride-2 stem, then N stages of
:class:`~..ops.hourglass.ASPPHourglass`, each with its *own* task head
(stage 1: person/background mask, stage 2: skeleton limb-segment map,
stage 3: keypoint map in the reference config) and a compressed feature
return: ``inter = concat[1x1(logits)→f/2, 1x1(features)→f/4,
1x1(prev_inter)→f/4]`` (train.py:580-583). The final stage emits logits only.

:class:`StageSequentialProgressive` is the hard-masking ablation
(/root/reference/try_remove_background_and_costomer_loss.py:314-360): the
stage-1 argmax mask multiplies the stem features before stage 2, and stage 3
receives ``1x1(concat[inter, features, logits])``.

:class:`MaskNet` is ``generateMask`` (/root/reference/train.py:604-622): the
stem plus a single ASPP hourglass and a 2-channel mask head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv, ResidualBlock
from ..ops.hourglass import ASPPHourglass


class Stem(nn.Module):
    """Shared stem (/root/reference/train.py:548-554): 7x7/2 conv → ReLU →
    ResidualBlock(128, stride 2) → ResidualBlock(128) → ResidualBlock(f).
    Reduces 256x256x3 → 64x64xf.
    """

    features: int = 256
    always_project: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            always_project=self.always_project,
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        y = Conv(64, 7, 2, 3, name="conv1", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        y = nn.relu(y)
        y = ResidualBlock(128, stride=2, name="residual1", **kw)(y)
        y = ResidualBlock(128, name="residual2", **kw)(y)
        y = ResidualBlock(self.features, name="residual3", **kw)(y)
        return y


class ProgressiveHourglass(nn.Module):
    """3-stage progressive model (/root/reference/train.py:545-601).

    ``out_channels`` defaults to the reference MPII config: (2 background,
    nSkeleton_MPII+1 = 16 skeleton, nKeypoint_MPII+1 = 17 keypoint)
    (train.py:44-48). Returns a list of per-stage NHWC logits at 1/4 input
    resolution, ordered stage 1 → N (train.py:573-601).
    """

    features: int = 256
    out_channels: Sequence[int] = (2, 16, 17)
    hourglass_depth: int = 4
    always_project: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    remat: bool = False  # rematerialize each stage hourglass in backward
    # Inference-only tail fold (the StackedHourglass.fold_tail analogue): for
    # every NON-final stage, ``stage{i}_return(stage{i}_out(ll))`` is two
    # bias-free 1x1 convs, so it collapses into ONE f→f/2 matmul with weights
    # ``W_out·W_ret`` composed in fp32 from the live params — the lane-padded
    # 2/16/17-channel logits intermediates disappear. Only the final stage's
    # logits are produced (the reference's eval consumes result[-1],
    # /root/reference/train.py:1132-1134); param tree unchanged (init traces
    # the unfolded graph), so training checkpoints load directly.
    fold_tail: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            always_project=self.always_project,
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.features
        n_stages = len(self.out_channels)
        HG = nn.remat(ASPPHourglass) if self.remat else ASPPHourglass
        if self.fold_tail and not self.use_running_average:
            raise ValueError(
                "fold_tail is inference-only: it drops the intermediate-stage "
                "outputs that training supervision needs"
            )
        use_fold = self.fold_tail and not self.is_initializing()

        inter = Stem(f, name="preprocess1", **kw)(x)
        outs = []
        for i, n_out in enumerate(self.out_channels, start=1):
            ll = HG(f, depth=self.hourglass_depth, name=f"stage{i}", **kw)(inter)
            if use_fold and i < n_stages:
                wo = self.get_variable("params", f"stage{i}_out")["conv"]["kernel"]
                wr = self.get_variable("params", f"stage{i}_return")["conv"]["kernel"]
                wf = (
                    jnp.asarray(wo, jnp.float32).reshape(f, n_out)
                    @ jnp.asarray(wr, jnp.float32).reshape(n_out, f // 2)
                ).astype(self.dtype)
                ret = jax.lax.dot_general(ll, wf, (((3,), (0,)), ((), ())))
            else:
                logits = Conv(n_out, 1, 1, 0, use_bias=False, name=f"stage{i}_out", **ckw)(ll)
                outs.append(logits)
                if i < n_stages:
                    # Compressed feature return (train.py:580-583): the next
                    # stage sees [projected logits (f/2), projected hourglass
                    # features (f/4), projected previous inter (f/4)].
                    ret = Conv(f // 2, 1, 1, 0, use_bias=False, name=f"stage{i}_return", **ckw)(
                        logits
                    )
            if i < n_stages:
                ll_ = Conv(f // 4, 1, 1, 0, use_bias=False, name=f"stage{i}_return_2", **ckw)(ll)
                inter = Conv(
                    f // 4, 1, 1, 0, use_bias=False, name=f"stage{i}_down_feature", **ckw
                )(inter)
                inter = jnp.concatenate([ret, ll_, inter], axis=-1)
        return outs


class StageSequentialProgressive(nn.Module):
    """Hard-masking ablation
    (/root/reference/try_remove_background_and_costomer_loss.py:311-362).

    Each stage is an UNSHARED ``Sequential(CatMergeHourglass(4, f),
    ResidualBlock(f, f))`` (lines 321-338; the cat-merge hourglass of the
    removed-max-pool lineage — its constructed ASPP modules are dead code).
    Stage 1 predicts the background mask from the stem features; the stem
    features are then multiplied by ``argmax(mask)`` (foreground = 1,
    line 348) before stage 2; stage 3 input is
    ``stage2_return(concat[masked stem, stage-2 features, stage-2 logits])``
    (bias-free, line 332). Heads are bias-free; reference channels
    (2, nSkeleton+1=20, nKeypoint=17) with losses annealed-OHEM-CE /
    masked-CE / masked-MSE-on-Gaussians (lines 373-375, 419-421 — the
    ``masked`` objective).
    """

    features: int = 256
    out_channels: Sequence[int] = (2, 20, 17)
    hourglass_depth: int = 4
    always_project: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            always_project=self.always_project,
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.features
        c0, c1, c2 = self.out_channels

        from ..ops.hourglass import CatMergeHourglass

        def stage(h, i):
            h = CatMergeHourglass(
                f, self.hourglass_depth, name=f"stage{i}", **kw
            )(h)
            return ResidualBlock(f, name=f"stage{i}_residual", **kw)(h)

        feats = Stem(f, name="preprocess1", **kw)(x)
        outs = []

        ll = stage(feats, 1)
        mask_logits = Conv(c0, 1, 1, 0, use_bias=False, name="stage1_out", **ckw)(ll)
        outs.append(mask_logits)

        mask = jnp.argmax(mask_logits, axis=-1)[..., None].astype(feats.dtype)
        inter = feats * mask

        ll = stage(inter, 2)
        sk_logits = Conv(c1, 1, 1, 0, use_bias=False, name="stage2_out", **ckw)(ll)
        outs.append(sk_logits)

        merged = jnp.concatenate([inter, ll, sk_logits], axis=-1)
        inter = Conv(f, 1, 1, 0, use_bias=False, name="stage2_return", **ckw)(merged)

        ll = stage(inter, 3)
        kp_logits = Conv(c2, 1, 1, 0, use_bias=False, name="stage3_out", **ckw)(ll)
        outs.append(kp_logits)
        return outs


class MaskNet(nn.Module):
    """``generateMask`` (/root/reference/train.py:604-622): stem + one ASPP
    hourglass + 2-channel person/background head."""

    features: int = 256
    out_channels: int = 2
    hourglass_depth: int = 4
    always_project: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            always_project=self.always_project,
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        inter = Stem(self.features, name="preprocess1", **kw)(x)
        ll = ASPPHourglass(self.features, depth=self.hourglass_depth, name="stage1", **kw)(inter)
        return Conv(
            self.out_channels,
            1,
            1,
            0,
            use_bias=False,
            name="stage1_out",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(ll)
