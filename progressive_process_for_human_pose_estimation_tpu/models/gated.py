"""Cat-merge progressive models (the "removed max-pool" lineage).

Two reference scripts share this architecture exactly — a
conv7x7/2 → ReLU → ResidualBlock(128, stride 2) → ResidualBlock(128) →
ResidualBlock(f) stem (NO maxpool; the :class:`~.progressive.Stem` module),
then 3 stacks of ONE weight-shared :class:`~..ops.hourglass.CatMergeHourglass`
+ full ResidualBlock + lin, with bias-free per-stack heads — and differ only
in the first feature return:

- :class:`GatedRecursiveProgressive` with ``gate_stage0=True`` rebuilds
  /root/reference/try_costomer_loss.py:284-330: after stage 0 the features
  are ``conv4_0(concat[inter, ll] * argmax(mask))`` (the predicted-foreground
  hard gate, biased conv, line 294/316-321);
- with ``gate_stage0=False`` it rebuilds
  /root/reference/try_with_aspp_remove_max_pool.py:262-301 (BASELINE
  config 4, "remove max pool"): no gate, and stage 0's logits join the
  return — ``conv4_0(concat[inter, ll, out0])`` (biased, line 272).

Common tail: stage 1 returns ``conv4_1(concat[inter, ll, out1])``
(bias-free); stage 2 only emits logits. Heads ``conv2_0/1/2`` are bias-free;
reference channels (2, nSkeleton+1=20, nKeypoint=17) with losses
CE / CE / MSE-on-Gaussians (try_costomer_loss.py:341-343,
try_with_aspp_remove_max_pool.py:315-317 — the ``progressive_ce_ce_mse``
objective).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv, ConvBNReLU, ResidualBlock
from ..ops.hourglass import CatMergeHourglass
from .progressive import Stem


class GatedRecursiveProgressive(nn.Module):
    """3-stack weight-shared cat-merge progressive
    (/root/reference/try_costomer_loss.py:284-330 with ``gate_stage0``;
    /root/reference/try_with_aspp_remove_max_pool.py:262-301 without)."""

    features: int = 256
    out_channels: Sequence[int] = (2, 20, 17)
    hourglass_depth: int = 4
    gate_stage0: bool = True
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

        inter = Stem(f, name="preprocess1", **kw)(x)

        hourglass = CatMergeHourglass(
            f, self.hourglass_depth, name="hourglass1", **kw
        )
        residual4 = ResidualBlock(f, name="residual4", **kw)
        lin = ConvBNReLU(
            f, 1, use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name, name="lin", **ckw,
        )

        outs = []

        # Stage 0: background mask.
        ll = lin(residual4(hourglass(inter)))
        mask_logits = Conv(c0, 1, 1, 0, use_bias=False, name="conv2_0", **ckw)(ll)
        outs.append(mask_logits)
        if self.gate_stage0:
            # try_costomer_loss.py:316-321: hard-multiply by argmax(mask).
            gate = jnp.argmax(mask_logits, axis=-1)[..., None].astype(ll.dtype)
            merged = jnp.concatenate([inter, ll], axis=-1) * gate
        else:
            # try_with_aspp_remove_max_pool.py:293-295: logits join the return.
            merged = jnp.concatenate([inter, ll, mask_logits], axis=-1)
        inter = Conv(f, 1, 1, 0, name="conv4_0", **ckw)(merged)  # biased

        # Stage 1: skeleton map.
        ll = lin(residual4(hourglass(inter)))
        sk_logits = Conv(c1, 1, 1, 0, use_bias=False, name="conv2_1", **ckw)(ll)
        outs.append(sk_logits)
        merged = jnp.concatenate([inter, ll, sk_logits], axis=-1)
        inter = Conv(f, 1, 1, 0, use_bias=False, name="conv4_1", **ckw)(merged)

        # Stage 2: keypoint Gaussians (MSE head, 17 ch — no background).
        ll = lin(residual4(hourglass(inter)))
        outs.append(Conv(c2, 1, 1, 0, use_bias=False, name="conv2_2", **ckw)(ll))
        return outs
