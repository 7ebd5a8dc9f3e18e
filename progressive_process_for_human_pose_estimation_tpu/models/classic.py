"""Classic Newell stacked-hourglass baseline, NHWC.

Rebuilds ``creatModel`` from /root/reference/hourglass_compare.py:546-638: a
BN'd stem with maxpool, then ``n_stack`` stacks of (ClassicHourglass →
ResidualBlock → 1x1 conv-BN-ReLU), 16-channel heatmap heads with
*additive* feature return ``inter = 1x1(logits) + inter + 1x1(features)``
(hourglass_compare.py:601-638). Trained with per-stack MSE on Gaussian
targets — the fair-comparison baseline for the progressive model.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import BatchNorm, Conv, ResidualBlock
from ..ops.hourglass import ClassicHourglass
from ..ops.resize import max_pool_2x2


class ClassicStackedHourglass(nn.Module):
    """4-stack baseline (/root/reference/hourglass_compare.py:546-638).

    Returns a list of ``n_stack`` NHWC heatmap tensors (16 channels in the
    reference MPII config) at 1/4 input resolution.
    """

    features: int = 256
    n_stack: int = 4
    out_channels: int = 16
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
        bnkw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.features

        # Stem (hourglass_compare.py:548-556): conv7x7/2 → BN → ReLU →
        # Residual(128) → maxpool → Residual(128) → Residual(f).
        y = Conv(64, 7, 2, 3, name="stem_conv1", **ckw)(x)
        y = BatchNorm(name="stem_bn1", **bnkw)(y)
        y = nn.relu(y)
        y = ResidualBlock(128, name="stem_residual1", **kw)(y)
        y = max_pool_2x2(y)
        y = ResidualBlock(128, name="stem_residual2", **kw)(y)
        inter = ResidualBlock(f, name="stem_residual3", **kw)(y)

        outs = []
        for i in range(1, self.n_stack + 1):
            # Stack body (hourglass_compare.py:558-564): hourglass →
            # residual → 1x1 conv → BN → ReLU.
            ll = ClassicHourglass(f, depth=self.hourglass_depth, name=f"stage{i}_hourglass", **kw)(
                inter
            )
            ll = ResidualBlock(f, name=f"stage{i}_residual", **kw)(ll)
            ll = Conv(f, 1, 1, 0, name=f"stage{i}_conv", **ckw)(ll)
            ll = BatchNorm(name=f"stage{i}_bn", **bnkw)(ll)
            ll = nn.relu(ll)

            logits = Conv(self.out_channels, 1, 1, 0, use_bias=False, name=f"stage{i}_out", **ckw)(
                ll
            )
            outs.append(logits)

            if i < self.n_stack:
                # Additive return (hourglass_compare.py:608-611).
                ret = Conv(f, 1, 1, 0, use_bias=False, name=f"stage{i}_return", **ckw)(logits)
                ll_ = Conv(f, 1, 1, 0, use_bias=False, name=f"stage{i}_down_feature", **ckw)(ll)
                inter = ret + inter + ll_
        return outs
