"""BN-folded fast inference path for the recursive StackedHourglass family.

Mirrors :class:`..models.recursive.StackedHourglass` (share_weights=True)
functionally — same math, same outputs — but with every eval-mode BatchNorm
folded into its neighbouring conv and the hot equal-channel residual blocks
executed either as folded-jnp (``residual_impl='fast'``) or as one fused
Pallas kernel (``residual_impl='pallas'``, see fused_residual.py). Built for
the BASELINE headline benchmark (8-stack hourglass inference at 256x256).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.resize import max_pool_2x2, upsample2x_bilinear_align_corners
from .fused_residual import (
    fold_lite_residual_params,
    lite_residual_fast,
    lite_residual_hybrid,
    lite_residual_pallas,
)


def _fold_conv_bn(conv_p, bn_p, bn_s, dtype=jnp.bfloat16, eps: float = 1e-5):
    """conv(1x1, bias) + BN + ReLU → single conv weights (the `lin` block)."""
    scale = bn_p["scale"].astype(jnp.float32)
    bias = bn_p["bias"].astype(jnp.float32)
    mean = bn_s["mean"].astype(jnp.float32)
    var = bn_s["var"].astype(jnp.float32)
    a = scale / jnp.sqrt(var + eps)
    b = bias - mean * a
    w = conv_p["kernel"].astype(jnp.float32)[0, 0] * a[None, :]
    c = conv_p["bias"].astype(jnp.float32) * a + b
    return w.astype(dtype), c.astype(dtype)


def _matmul1x1(x, w, b=None):
    y = jax.lax.dot_general(
        x, w, (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return y if b is None else y + b


def build_fast_apply(model, variables, residual_impl: str = "hybrid",
                     interpret: bool = False):
    """Build `fast(x) -> [stack outputs]` for a share_weights StackedHourglass.

    Args:
      model: the StackedHourglass module instance (for its static config).
      variables: trained {'params', 'batch_stats'} (eval-mode statistics).
      interpret: run Pallas kernels in interpreter mode (CPU testing).
    """
    assert model.share_weights, "fast path covers the weight-shared family"
    p = variables["params"]
    s = variables["batch_stats"]
    dt = jnp.bfloat16

    res = {
        "fast": lite_residual_fast,
        "pallas": lite_residual_pallas,
        "hybrid": lite_residual_hybrid,
        # 'subtree': XLA everywhere EXCEPT one megakernel for the whole
        # <=16^2 subtree (subtree16.subtree16_pallas) — the per-block
        # residuals outside it run the folded-jnp path.
        "subtree": lite_residual_fast,
    }[residual_impl]

    stem_convw = p["conv1"]["conv"]["kernel"].astype(dt)
    stem_convb = p["conv1"]["conv"]["bias"].astype(dt)
    fp_res = {
        name: fold_lite_residual_params(p[name], s[name], dt)
        for name in ("residual1", "residual2", "residual3", "residual4")
    }
    # One folded block per hourglass level (the reference shares within a
    # level, not across levels — see ops.hourglass.RecursiveHourglass).
    fp_hg = {
        n: fold_lite_residual_params(
            p["hourglass1"][f"residual_block_n{n}"],
            s["hourglass1"][f"residual_block_n{n}"],
            dt,
        )
        for n in range(1, model.hourglass_depth + 1)
    }
    lin_w, lin_b = _fold_conv_bn(
        p["lin"]["conv"]["conv"], p["lin"]["bn"]["bn"], s["lin"]["bn"]["bn"], dt
    )
    head_w = p["conv2"]["conv"]["kernel"].astype(dt)[0, 0]
    head_b = p["conv2"]["conv"]["bias"].astype(dt)
    ret_ll_w = p["conv3"]["conv"]["kernel"].astype(dt)[0, 0]
    ret_ll_b = p["conv3"]["conv"]["bias"].astype(dt)
    ret_out_w = p["conv4"]["conv"]["kernel"].astype(dt)[0, 0]
    ret_out_b = p["conv4"]["conv"]["bias"].astype(dt)

    n_modules = model.n_modules
    depth = model.hourglass_depth
    n_stack = model.n_stack
    variant = model.variant
    sks = model.skeleton
    if sks is None:
        from ..models.recursive import COCO_SKELETON

        sks = COCO_SKELETON
    out_channels = model.out_channels

    def apply_mods(h, n):
        for _ in range(n_modules):
            h = res(h, fp_hg[n])
        return h

    def hourglass(h, n):
        if (residual_impl == "subtree" and n == 2
                and h.shape[1] == h.shape[2] == 16):
            from .subtree16 import subtree16_pallas

            return subtree16_pallas(h, fp_hg[2], fp_hg[1], n_modules,
                                    interpret=interpret)
        up1 = apply_mods(h, n)
        low1 = apply_mods(max_pool_2x2(h), n)
        low2 = hourglass(low1, n - 1) if n > 1 else apply_mods(low1, n)
        low3 = apply_mods(low2, n)
        return up1 + upsample2x_bilinear_align_corners(low3)

    def fast(x):
        x = x.astype(dt)
        y = jax.lax.conv_general_dilated(
            x, stem_convw, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + stem_convb
        y = jnp.maximum(y, 0)
        y = lite_residual_fast(y, fp_res["residual1"])  # 64->128 (projection)
        y = max_pool_2x2(y)
        y = res(y, fp_res["residual2"]) if "w4" not in fp_res["residual2"] else (
            lite_residual_fast(y, fp_res["residual2"])
        )
        inter = lite_residual_fast(y, fp_res["residual3"])  # 128->256

        outs = []
        for i in range(n_stack):
            ll = hourglass(inter, depth)
            for _ in range(n_modules):
                ll = res(ll, fp_res["residual4"])
            ll = jnp.maximum(_matmul1x1(ll, lin_w, lin_b), 0)
            head_out = _matmul1x1(ll, head_w, head_b)

            if variant == "plain":
                stack_out, return_feed = head_out, head_out
            elif variant == "skeleton_from_keypoints":
                sk = head_out[..., sks[:, 0] + 1] + head_out[..., sks[:, 1] + 1]
                stack_out = jnp.concatenate([head_out, sk], axis=-1)
                return_feed = head_out
            elif variant == "skeleton_from_keypoints_merge":
                # no background channel here: sks indexed WITHOUT the +1
                # (/root/reference/try_skeleton_from_keypoints_merge.py:297)
                sk = head_out[..., sks[:, 0]] + head_out[..., sks[:, 1]]
                stack_out = jnp.concatenate([head_out, sk], axis=-1)
                return_feed = stack_out
            elif variant == "skeleton_merge":
                base = out_channels - len(sks)
                sk_part = (
                    head_out[..., base:]
                    - head_out[..., 0:1]
                    + head_out[..., sks[:, 0]]
                    + head_out[..., sks[:, 1]]
                )
                stack_out = jnp.concatenate([head_out[..., :base], sk_part], axis=-1)
                return_feed = stack_out
            else:
                raise ValueError(variant)

            outs.append(stack_out)
            if i < n_stack - 1:
                inter = _matmul1x1(ll, ret_ll_w, ret_ll_b) + _matmul1x1(
                    return_feed, ret_out_w, ret_out_b
                )
        return outs

    return fast
