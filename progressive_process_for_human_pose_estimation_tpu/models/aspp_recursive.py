"""Progressive model on the RECURSIVE weight-shared hourglass with an ASPP
bottleneck — the try_more_layer / try_with_aspp lineage.

Rebuilds ``creatModel`` of /root/reference/try_more_layer.py:315-363 (4
stacks, innermost level = ASPP, try_more_layer.py:280-290) and
/root/reference/try_with_aspp.py:283-331 (3 stacks, innermost level =
pass-through — that file constructs ASPP modules its forward never calls):
stem → shared ``hourglass(4, f)``, shared residual4/lin, per-stage heads:

- stage 0: background (conv2_0, 2 ch), return ``inter = conv4_0(cat[ll, out])``
  (conv4_0 is the only BIASED head conv — a reference quirk, line 330 vs 332);
- stage 1: skeleton (conv2_1), return via bias-free conv4_1;
- stages ≥ 2: keypoints via the SAME conv2_2 head with NO feature return
  (try_more_layer.py:359-361) — with weight sharing every stage ≥ 2 consumes
  the same ``inter`` through the same weights, so their outputs are
  identical; kept bit-faithful.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv, ConvBNReLU, ResidualBlockLite
from ..ops.hourglass import RecursiveHourglass
from ..ops.resize import max_pool_2x2


class ProgressiveRecursiveASPP(nn.Module):
    """3/4-stack progressive recursive hourglass with ASPP bottleneck.

    ``out_channels`` = (background, skeleton, keypoints); stacks beyond 3
    reuse the keypoint head (try_more_layer.py:359).
    """

    features: int = 256
    out_channels: Sequence[int] = (2, 20, 17)
    n_stack: int = 3
    n_modules: int = 2
    hourglass_depth: int = 4
    # Innermost-level behaviour (ops.hourglass.RecursiveHourglass.bottleneck):
    # try_more_layer's forward applies its ASPP ('aspp'); try_with_aspp
    # constructs ASPP modules but its forward never calls them, so its
    # innermost level is a pass-through ('identity').
    bottleneck: str = "aspp"
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

        # Stem (try_more_layer.py:318-323, 336-342).
        y = Conv(64, 7, 2, 3, name="conv1", **ckw)(x)
        y = nn.relu(y)
        y = ResidualBlockLite(128, name="residual1", **kw)(y)
        y = max_pool_2x2(y)
        y = ResidualBlockLite(128, name="residual2", **kw)(y)
        inter = ResidualBlockLite(f, name="residual3", **kw)(y)

        hourglass = RecursiveHourglass(
            f,
            self.hourglass_depth,
            self.n_modules,
            share_weights=True,
            bottleneck=self.bottleneck,
            name="hourglass1",
            **kw,
        )
        residual4 = ResidualBlockLite(f, name="residual4", **kw)
        lin = ConvBNReLU(f, 1, name="lin", **kw)
        head_bg = Conv(c0, 1, 1, 0, use_bias=False, name="conv2_0", **ckw)
        ret_bg = Conv(f, 1, 1, 0, use_bias=True, name="conv4_0", **ckw)
        head_sk = Conv(c1, 1, 1, 0, use_bias=False, name="conv2_1", **ckw)
        ret_sk = Conv(f, 1, 1, 0, use_bias=False, name="conv4_1", **ckw)
        head_kp = Conv(c2, 1, 1, 0, use_bias=False, name="conv2_2", **ckw)

        outs = []
        for i in range(self.n_stack):
            ll = hourglass(inter)
            for _ in range(self.n_modules):
                ll = residual4(ll)
            ll = lin(ll)
            if i == 0:
                out = head_bg(ll)
                inter = ret_bg(jnp.concatenate([ll, out], axis=-1))
            elif i == 1:
                out = head_sk(ll)
                inter = ret_sk(jnp.concatenate([ll, out], axis=-1))
            else:
                out = head_kp(ll)
            outs.append(out)
        return outs
