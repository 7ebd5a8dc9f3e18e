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

from .blocks import ASPPBlock, Conv, ResidualBlock, ResidualBlockLite
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

    Weight-sharing semantics match the reference exactly: each *level* owns
    ONE ``ResidualBlockLite(f, f)`` instance (``self.residual_block`` of that
    nesting's ``hourglass`` module — nested levels are separate modules,
    only_one_hourgless.py:171-175), applied ``n_modules`` times on the skip
    branch, the downsampled branch, and the decode branch of that level; the
    innermost level applies it ``n_modules`` more times in place of
    recursion. Sharing across *stacks* comes from the caller reusing the
    module instance (only_one_hourgless.py:224-253). ``share_weights=False``
    gives the fully-unshared Keras-style version (model.py:66-84).
    Upsampling is bilinear with align_corners=True; the merge is additive.

    ``bottleneck`` selects what happens at the innermost level in place of
    recursion — the try_* scripts differ here:

    - ``'modules'`` — ``n_modules`` more applications of the level's residual
      (only_one_hourgless.py:186-189, try_different_stack_without_skeleton
      .py:253-256);
    - ``'identity'`` — nothing: ``low2 = low1``
      (/root/reference/try_with_aspp.py:267-269 — the file CONSTRUCTS ASPP
      modules at every level but its forward never calls them);
    - ``'aspp'`` — an ASPP block with bare-conv projection
      (/root/reference/try_more_layer.py:280-290, the only script whose
      forward actually applies its ASPP). The reference's dead outer-level
      ASPP copies are not reproduced.
    """

    features: int = 256
    depth: int = 4
    n_modules: int = 2
    share_weights: bool = True
    bottleneck: str = "modules"
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    fused_eval: bool = False  # see ResidualBlockLite.fused_eval
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            fused_eval=self.fused_eval,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        f = self.features

        if self.bottleneck not in ("modules", "identity", "aspp"):
            raise ValueError(f"unknown bottleneck {self.bottleneck!r}")
        aspp = (
            ASPPBlock(
                f,
                project_bn_relu=False,
                use_running_average=self.use_running_average,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="aspp",
            )
            if self.bottleneck == "aspp"
            else None
        )

        def level(h, n, prefix):
            if self.share_weights:
                # One block per level, reused across this level's branches
                # (the reference's per-nesting self.residual_block).
                blk = ResidualBlockLite(f, name=f"residual_block_n{n}", **kw)

                def mods(v, _tag):
                    for _ in range(self.n_modules):
                        v = blk(v)
                    return v

            else:

                def mods(v, tag):
                    for j in range(self.n_modules):
                        v = ResidualBlockLite(
                            f, name=f"{prefix}{tag}_{j + 1}", **kw
                        )(v)
                    return v

            up1 = mods(h, "up")
            low1 = max_pool_2x2(h)
            low1 = mods(low1, "low1")
            if n > 1:
                low2 = level(low1, n - 1, f"{prefix}inner_")
            elif aspp is not None:
                # Innermost level: ASPP replaces the residual chain
                # (try_more_layer.py:280-290: low2 = conv1(cat[aspp1..4, gap])).
                low2 = aspp(low1)
            elif self.bottleneck == "identity":
                low2 = low1  # try_with_aspp.py:267-269
            else:
                low2 = mods(low1, "low2")
            low3 = mods(low2, "low3")
            up2 = upsample2x_bilinear_align_corners(low3)
            return up1 + up2

        return level(x, self.depth, "")


class CatMergeHourglass(nn.Module):
    """Cat-merge recursive hourglass — the "removed max-pool" family shared
    by /root/reference/try_costomer_loss.py:227-264,
    try_with_aspp_remove_max_pool.py:209-246 and
    try_remove_background_and_costomer_loss.py:246-292 (identical class in
    each). Per level: the skip is the input UNTOUCHED (``up1 = x``); the
    down path is ONE stride-2 full ResidualBlock; below the recursion, ONE
    stride-1 ResidualBlock; bilinear align_corners=True upsample; merge =
    ``1x1 bias-free conv over concat[up1, up2]``. Every level owns its own
    two residual blocks and merge conv (nested ``hourglass(n-1)`` modules).
    The scripts also construct ASPP modules and a ``conv3`` at every level
    that their forwards never call — that dead code is not reproduced.

    The residual blocks are the full pre-activation kind WITH the
    always-project quirk (these files' ResidualBlock has ``bn4`` + a
    ``stride != 1 | numIn != numOut`` skip condition —
    try_costomer_loss.py:187-224), unlike the Lite blocks of the
    maxpool/add-merge family.
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
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.features

        def level(h, n, prefix):
            up1 = h
            low1 = ResidualBlock(
                f, stride=2, name=f"{prefix}residual_stride", **kw
            )(h)
            low2 = level(low1, n - 1, f"{prefix}inner_") if n > 1 else low1
            low3 = ResidualBlock(f, name=f"{prefix}residual", **kw)(low2)
            up2 = upsample2x_bilinear_align_corners(low3)
            merged = jnp.concatenate([up1, up2], axis=-1)
            return Conv(f, 1, 1, 0, use_bias=False, name=f"{prefix}conv2", **ckw)(
                merged
            )

        return level(x, self.depth, "")
