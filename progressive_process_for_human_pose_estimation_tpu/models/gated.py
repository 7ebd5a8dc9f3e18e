"""Gated recursive progressive model (the try_costomer_loss lineage).

Rebuilds the 3-stage model of /root/reference/try_costomer_loss.py:296-330
(shared recursive hourglass + per-stage heads):

- stage 0 predicts the 2-ch background mask; the next stage's features are
  ``conv4_0(concat[inter, ll] * argmax(mask))`` — the predicted-foreground
  gate (try_costomer_loss.py:316-321);
- stage 1 predicts the skeleton map; next features are
  ``conv4_1(concat[inter, ll, logits])``;
- stage 2 predicts the keypoint map.

Like the rest of the try_* family, ONE hourglass / residual / lin instance
is weight-shared across all stages.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv, ConvBNReLU, ResidualBlockLite
from ..ops.hourglass import RecursiveHourglass
from ..ops.resize import max_pool_2x2


class GatedRecursiveProgressive(nn.Module):
    """3-stage progressive with argmax-mask feature gating
    (/root/reference/try_costomer_loss.py:279-330)."""

    features: int = 256
    out_channels: Sequence[int] = (2, 20, 18)
    n_modules: int = 1  # try_costomer_loss applies residual4 once (line 310)
    hourglass_depth: int = 4
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.features
        c0, c1, c2 = self.out_channels

        y = Conv(64, 7, 2, 3, name="conv1", **ckw)(x)
        y = nn.relu(y)
        y = ResidualBlockLite(128, name="residual1", **kw)(y)
        y = max_pool_2x2(y)
        y = ResidualBlockLite(128, name="residual2", **kw)(y)
        inter = ResidualBlockLite(f, name="residual3", **kw)(y)

        hourglass = RecursiveHourglass(
            f, self.hourglass_depth, self.n_modules, share_weights=True,
            name="hourglass1", **kw,
        )
        residual4 = ResidualBlockLite(f, name="residual4", **kw)
        lin = ConvBNReLU(f, 1, name="lin", **kw)

        outs = []

        # Stage 0: background mask + argmax gate.
        ll = lin(residual4(hourglass(inter)))
        mask_logits = Conv(c0, 1, 1, 0, name="conv2_0", **ckw)(ll)
        outs.append(mask_logits)
        gate = jnp.argmax(mask_logits, axis=-1)[..., None].astype(ll.dtype)
        merged = jnp.concatenate([inter, ll], axis=-1) * gate
        inter = Conv(f, 1, 1, 0, name="conv4_0", **ckw)(merged)

        # Stage 1: skeleton map.
        ll = lin(residual4(hourglass(inter)))
        sk_logits = Conv(c1, 1, 1, 0, name="conv2_1", **ckw)(ll)
        outs.append(sk_logits)
        merged = jnp.concatenate([inter, ll, sk_logits], axis=-1)
        inter = Conv(f, 1, 1, 0, name="conv4_1", **ckw)(merged)

        # Stage 2: keypoint map.
        ll = lin(residual4(hourglass(inter)))
        outs.append(Conv(c2, 1, 1, 0, name="conv2_2", **ckw)(ll))
        return outs
