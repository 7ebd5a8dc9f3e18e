"""Hourglass encoder-decoders — all three reference variants, NHWC.

- :class:`ASPPHourglass` — the final model's explicit encoder-decoder:
  four stride-2 residual downsamples, ASPP bottleneck, and a decoder that
  nearest-upsamples, halves channels with a residual block, then concatenates
  the matching skip (/root/reference/train.py:498-542; evolution traced in
  /root/reference/try_with_aspp_remove_max_pool.py:209-240). No maxpool.
- :class:`ClassicHourglass` — the Newell-style baseline: maxpool downsamples,
  full-width residual skips, additive decoder merges
  (/root/reference/hourglass_compare.py:492-537).
- :class:`RecursiveHourglass` — the recursive try_* variant with a single
  weight-shared residual block applied ``n_modules`` times per branch and
  bilinear align_corners=True upsampling
  (/root/reference/only_one_hourgless.py:168-196). ``share_weights=False``
  gives the unshared Keras-style version (/root/reference/model.py:66-84).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ASPPBlock, ResidualBlock, ResidualBlockLite
from .resize import max_pool_2x2, upsample2x_bilinear_align_corners, upsample2x_nearest


class ASPPHourglass(nn.Module):
    """Final-model hourglass (/root/reference/train.py:498-542).

    Encoder: 4x ``ResidualBlock(f, f, stride=2)``; skip at each scale:
    ``ResidualBlock(f, f/2)``. Bottleneck: :class:`ASPPBlock`. Decoder per
    scale: nearest 2x upsample → ``ResidualBlock(f, f/2)`` → concat skip
    (f/2 + f/2 = f). Output has f channels at input resolution.
    """

    features: int = 256
    depth: int = 4
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
        f = self.features
        half = f // 2

        skips = []
        down = x
        for i in range(self.depth):
            skips.append(ResidualBlock(half, name=f"residual{i + 1}", **kw)(down))
            down = ResidualBlock(f, stride=2, name=f"downsample{i + 1}", **kw)(down)

        out = ASPPBlock(
            f,
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="aspp",
        )(down)

        for i in reversed(range(self.depth)):
            out = upsample2x_nearest(out)
            out = ResidualBlock(half, name=f"upsample{i + 1}", **kw)(out)
            out = jnp.concatenate([out, skips[i]], axis=-1)
        return out


class ClassicHourglass(nn.Module):
    """Newell baseline hourglass (/root/reference/hourglass_compare.py:492-537).

    Encoder: maxpool 2x2 + ``ResidualBlock(f, f)``; skips are full-width
    residuals. Bottleneck: one residual. Decoder: residual → nearest 2x
    upsample → add skip.
    """

    features: int = 256
    depth: int = 4
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
        f = self.features

        skips = []
        down = x
        for i in range(self.depth):
            skips.append(ResidualBlock(f, name=f"residual{i + 1}", **kw)(down))
            down = max_pool_2x2(down)
            down = ResidualBlock(f, name=f"downsample{i + 1}", **kw)(down)

        out = ResidualBlock(f, name=f"residual{self.depth + 1}", **kw)(down)

        for i in reversed(range(self.depth)):
            out = ResidualBlock(f, name=f"upsample{i + 1}", **kw)(out)
            out = upsample2x_nearest(out)
            out = out + skips[i]
        return out


class RecursiveHourglass(nn.Module):
    """Recursive weight-shared hourglass (/root/reference/only_one_hourgless.py:168-196).

    At each level: the *same* ``ResidualBlockLite(f, f)`` instance is applied
    ``n_modules`` times on both the skip branch and the downsampled branch
    (weight sharing across positions and levels when ``share_weights``); the
    innermost level applies it ``n_modules`` more times in place of recursion,
    then ``n_modules`` times again on the way up. Upsampling is bilinear with
    align_corners=True; the merge is additive.
    """

    features: int = 256
    depth: int = 4
    n_modules: int = 2
    share_weights: bool = True
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
        f = self.features

        if self.share_weights:
            shared = ResidualBlockLite(f, name="residual_block", **kw)

            def block(_name):
                return shared

        else:
            counter = [0]

            def block(_name):
                counter[0] += 1
                return ResidualBlockLite(f, name=f"{_name}_{counter[0]}", **kw)

        def apply_modules(h, name):
            for _ in range(self.n_modules):
                h = block(name)(h)
            return h

        def level(h, n, prefix):
            up1 = apply_modules(h, f"{prefix}up")
            low1 = max_pool_2x2(h)
            low1 = apply_modules(low1, f"{prefix}low1")
            if n > 1:
                if self.share_weights:
                    low2 = level(low1, n - 1, prefix)
                else:
                    low2 = level(low1, n - 1, f"{prefix}inner_")
            else:
                low2 = apply_modules(low1, f"{prefix}low2")
            low3 = apply_modules(low2, f"{prefix}low3")
            up2 = upsample2x_bilinear_align_corners(low3)
            return up1 + up2

        return level(x, self.depth, "")
