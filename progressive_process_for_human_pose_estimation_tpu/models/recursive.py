"""Recursive weight-shared stacked hourglass family, NHWC.

Rebuilds the ``creatModel``/``creatModelD`` family of the try_* scripts
(/root/reference/only_one_hourgless.py:215-283,
/root/reference/try_with_torch.py:246-298). Distinctive reference behaviour
kept here: ONE hourglass / residual / lin / head instance is reused
(weight-shared) across all stacks and, inside the hourglass, across all
levels and module repetitions (only_one_hourgless.py:224-253) —
``share_weights=False`` gives the conventional unshared network
(/root/reference/model.py:93-119 Keras version).

``variant`` selects the cross-channel output arithmetic the later scripts
experimented with:

- ``'plain'`` — per-stack heatmap/class-map output.
- ``'skeleton_from_keypoints'`` — skeleton channels *derived*, not learned:
  ``sk[e] = kp[sks[e,0]+1] + kp[sks[e,1]+1]`` appended to the output; only
  the keypoint half feeds the return conv
  (/root/reference/try_skeleton_from_keypoints.py:274-283).
- ``'skeleton_merge'`` — joint 38-ch output with in-place cross-channel
  merge: ``out[19:] += kp[sks[:,0]] + kp[sks[:,1]] - out[0]``; the merged
  tensor feeds the return conv AND is what the losses see (torch in-place
  semantics, /root/reference/try_skeleton_and_keypoints.py:270-298).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blocks import Conv, ConvBNReLU, ResidualBlockLite
from ..ops.hourglass import RecursiveHourglass
from ..ops.resize import max_pool_2x2

# COCO 19-edge skeleton, 0-based endpoints (pycocotools 'skeleton' minus 1;
# /root/reference/try_with_torch.py:52-70).
COCO_SKELETON = np.array(
    [
        [15, 13], [13, 11], [16, 14], [14, 12], [11, 12], [5, 11], [6, 12],
        [5, 6], [5, 7], [6, 8], [7, 9], [8, 10], [1, 2], [0, 1], [0, 2],
        [1, 3], [2, 4], [3, 5], [4, 6],
    ],
    dtype=np.int32,
)

# MPII 15-edge skeleton (/root/reference/train.py:82-97).
MPII_SKELETON = np.array(
    [
        [0, 1], [1, 2], [2, 6], [6, 3], [3, 4], [4, 5], [6, 7], [7, 8],
        [8, 9], [10, 11], [11, 12], [12, 8], [8, 13], [13, 14], [14, 15],
    ],
    dtype=np.int32,
)


def _merge_matrix(variant: str, out_channels: int, sks: np.ndarray):
    """Constant contraction matrix for the cross-channel output arithmetic.

    Every variant's channel arithmetic is linear in ``head_out``, so it is
    evaluated as one matmul (head_out @ M) instead of channel gathers +
    concatenate — the MXU eats the tiny matmul while the gather formulation
    costs real HBM traffic per stack (measured; numerics identical, the
    matrix rows are the same +/-1 sums the gathers compute).
    """
    c = out_channels
    if variant in ("skeleton_from_keypoints", "skeleton_from_keypoints_merge"):
        # skeleton_from_keypoints indexes sks+1 (channel 0 = background,
        # /root/reference/try_skeleton_from_keypoints.py:276); the _merge
        # variant's head is 17 Gaussian keypoint channels with NO background,
        # so it indexes sks directly
        # (/root/reference/try_skeleton_from_keypoints_merge.py:297).
        off = 1 if variant == "skeleton_from_keypoints" else 0
        m = np.zeros((c, c + len(sks)), np.float32)
        m[np.arange(c), np.arange(c)] = 1.0
        for e, (j0, j1) in enumerate(sks):
            m[j0 + off, c + e] += 1.0
            m[j1 + off, c + e] += 1.0
        return m
    if variant == "skeleton_merge":
        base = c - len(sks)
        m = np.zeros((c, c), np.float32)
        m[np.arange(c), np.arange(c)] = 1.0
        for e, (j0, j1) in enumerate(sks):
            d = base + e
            m[0, d] -= 1.0
            m[j0, d] += 1.0
            m[j1, d] += 1.0
        return m
    return None


class StackedHourglass(nn.Module):
    """Recursive stacked hourglass (/root/reference/only_one_hourgless.py:215-254).

    Stem: conv7x7/2 → ReLU → ResidualLite(128) → maxpool → ResidualLite(128)
    → ResidualLite(f). Per stack: hourglass → n_modules residuals → lin →
    biased 1x1 head; return ``inter = 1x1(ll) + 1x1(head_out)``.
    """

    features: int = 256
    n_stack: int = 1
    out_channels: int = 17
    n_modules: int = 2
    hourglass_depth: int = 4
    share_weights: bool = True
    variant: str = "plain"
    skeleton: Optional[np.ndarray] = None  # (E, 2) edge endpoints, 0-based
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    remat: bool = False  # rematerialize each hourglass in the backward pass
    # Remat tuning knobs (measured in bench/train_sweep; numerics identical):
    # remat_policy: None = save nothing (jax.checkpoint default), 'dots' =
    # keep MXU outputs (jax.checkpoint_policies.checkpoint_dots), and
    # 'dots_no_batch' = dots_with_no_batch_dims_saveable.
    remat_policy: Optional[str] = None
    remat_prevent_cse: bool = True
    # Compile the weight-shared stacks as ONE ``lax.scan`` iteration instead
    # of 8 unrolled copies: carry = the inter feature map, broadcast = the
    # shared params, carried batch_stats so the 8 sequential running-stat
    # updates compound in stack order exactly like the Python loop. Param
    # tree is IDENTICAL to the loop form (function-form nn.scan over `self`),
    # so checkpoints are interchangeable. With ``remat`` the whole stack body
    # (not just the hourglass) is rematerialized per iteration — the
    # scan-over-remat training pattern. Requires share_weights=True.
    scan_stacks: bool = False
    # Eval-time Pallas fusion of the 8²-16² hourglass levels (see
    # ResidualBlockLite.fused_eval); inference-only, shape-gated.
    fused_eval: bool = False
    # Inference-only tail fold: the per-stack chain
    #   head 1x1 (f→out_c) → merge matmul → conv4 (out_c'→f)  plus  conv3 (f→f)
    # is linear in ``ll``, so for every NON-final stack it collapses into ONE
    # f→f matmul ``ll @ (W3 + W2·M·W4) + (b3 + b4 + b2·M·W4)`` — removing the
    # lane-padded 38-channel intermediates entirely (measured 2.1-4.6x above
    # roofline, ROUND3_NOTES budget table). XLA cannot reassociate matmul
    # chains over runtime weights, so this is done at the module level. The
    # fold is computed in fp32 from the live params at apply time (a few
    # MFLOP, once per call). Only the FINAL stack's output is produced (the
    # reference's own eval consumes result[-1] only,
    # /root/reference/train.py:1132-1134); the return value is a one-element
    # list. Param tree is untouched: init traces the unfolded graph, so
    # checkpoints from normal training load directly.
    fold_tail: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _fold_tail_wb(self, names: Tuple[str, str, str], mr):
        """Collapse conv2→(merge)→conv4 plus conv3 into one f→f affine.

        All three are biased 1x1 convs and the merge is a constant matrix, so
        ``conv3(ll) + conv4(conv2(ll) @ Mr)`` ≡ ``ll @ Wf + bf`` with
        ``Wf = W3 + W2·Mr·W4`` and ``bf = b3 + b4 + (b2·Mr)·W4``. Composed in
        fp32 from the live params (a few MFLOP, once per call), cast to the
        compute dtype at the end — one rounding instead of the chain's three.
        """
        def wb(name):
            p = self.get_variable("params", name)["conv"]
            k = jnp.asarray(p["kernel"], jnp.float32)
            return k.reshape(-1, k.shape[-1]), jnp.asarray(p["bias"], jnp.float32)

        (w2, b2), (w3, b3), (w4, b4) = (wb(n) for n in names)
        if mr is not None:
            m = jnp.asarray(mr, jnp.float32)
            w2, b2 = w2 @ m, b2 @ m
        wf = w3 + w2 @ w4
        bf = b3 + b4 + b2 @ w4
        return wf.astype(self.dtype), bf.astype(self.dtype)

    @nn.compact
    def __call__(self, x):
        kw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        # Residual/hourglass modules additionally take the fusion flag
        # (ConvBNReLU/Conv do not).
        rkw = dict(kw, fused_eval=self.fused_eval)
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.features
        # Training-memory knob: each hourglass (the bulk of live activations)
        # is recomputed during the backward pass, trading one extra forward
        # inside the stack for a much smaller live working set. Pure
        # jax.checkpoint via nn.remat — numerics identical. Under
        # ``scan_stacks`` the remat boundary moves to the whole stack body
        # instead (see below).
        def _dots_and_pools(prim, *avals, **params):
            # 'dots' (= conv + dot outputs) PLUS the pool/upsample glue:
            # saves the reduce_window maxpools so the backward recomputes
            # only elementwise BN-affine/ReLU/adds (VERDICT r4 8c candidate).
            return (
                jax.checkpoint_policies.dots_saveable(prim, *avals, **params)
                or prim.name in ("reduce_window_max", "reduce_window")
            )

        policy = {
            None: None,
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "dots_and_pools": _dots_and_pools,
        }[self.remat_policy]
        use_scan = self.scan_stacks and self.n_stack > 1
        if self.scan_stacks and not self.share_weights:
            raise ValueError("scan_stacks requires share_weights=True")
        if self.fold_tail and self.scan_stacks:
            raise ValueError("fold_tail is incompatible with scan_stacks")
        if self.fold_tail and not self.use_running_average:
            raise ValueError(
                "fold_tail is inference-only: it drops the intermediate-stack "
                "outputs that training supervision needs"
            )
        # Init traces the unfolded graph so the param tree (and therefore
        # checkpoints) is identical with the fold on or off.
        use_fold = (
            self.fold_tail and self.n_stack > 1 and not self.is_initializing()
        )
        if self.remat and not use_scan:
            HG = nn.remat(
                RecursiveHourglass,
                prevent_cse=self.remat_prevent_cse,
                policy=policy,
            )
        else:
            HG = RecursiveHourglass

        y = Conv(64, 7, 2, 3, name="conv1", **ckw)(x)
        y = nn.relu(y)
        y = ResidualBlockLite(128, name="residual1", **rkw)(y)
        y = max_pool_2x2(y)
        y = ResidualBlockLite(128, name="residual2", **rkw)(y)
        inter = ResidualBlockLite(f, name="residual3", **rkw)(y)

        if use_scan:
            stack_mods = []
        elif self.share_weights:
            hourglass = HG(
                f, self.hourglass_depth, self.n_modules, share_weights=True,
                name="hourglass1", **rkw,
            )
            residual4 = ResidualBlockLite(f, name="residual4", **rkw)
            lin = ConvBNReLU(f, 1, name="lin", **kw)
            head = Conv(self.out_channels, 1, 1, 0, name="conv2", **ckw)
            ret_ll = Conv(f, 1, 1, 0, name="conv3", **ckw)
            ret_out = Conv(f, 1, 1, 0, name="conv4", **ckw)
            # Shared mode: the SAME residual4 applied n_modules times (torch
            # reuses self.residual4 in a loop, only_one_hourgless.py:243-244).
            stack_mods = [
                (hourglass, [residual4] * self.n_modules, lin, head, ret_ll, ret_out)
            ] * self.n_stack
        else:
            # Unshared mode: the Keras functional reference instantiates a
            # FRESH Residual per repetition (model.py:104-106), so each of
            # the n_modules applications gets its own weights.
            stack_mods = [
                (
                    HG(
                        f, self.hourglass_depth, self.n_modules, share_weights=False,
                        name=f"hourglass_{i}", **rkw,
                    ),
                    [
                        ResidualBlockLite(f, name=f"residual4_{i}_{j}", **rkw)
                        for j in range(self.n_modules)
                    ],
                    ConvBNReLU(f, 1, name=f"lin_{i}", **kw),
                    Conv(self.out_channels, 1, 1, 0, name=f"conv2_{i}", **ckw),
                    Conv(f, 1, 1, 0, name=f"conv3_{i}", **ckw),
                    Conv(f, 1, 1, 0, name=f"conv4_{i}", **ckw),
                )
                for i in range(self.n_stack)
            ]

        sks = self.skeleton if self.skeleton is not None else COCO_SKELETON
        if self.variant not in (
            "plain",
            "skeleton_from_keypoints",
            "skeleton_from_keypoints_merge",
            "skeleton_merge",
        ):
            raise ValueError(f"unknown variant {self.variant!r}")
        m = _merge_matrix(self.variant, self.out_channels, sks)
        merge_m = None if m is None else jnp.asarray(m, self.dtype)

        def apply_merge(head_out):
            return jax.lax.dot_general(
                head_out, merge_m, (((3,), (0,)), ((), ()))
            )

        if use_scan:
            # Function-form nn.scan over `self`: submodules created inside
            # the body land directly in this module's scope under the SAME
            # names as the loop form, so the param pytree (and therefore
            # checkpoints and torch weight transfer) is identical. The only
            # semantic deviation from the loop: conv3/conv4 also run on the
            # last stack and their result is discarded (two 1x1 convs of
            # extra FLOPs, no param or output difference).
            def stack_body(mdl, inter, _):
                ll = RecursiveHourglass(
                    f, self.hourglass_depth, self.n_modules,
                    share_weights=True, name="hourglass1", **rkw,
                )(inter)
                res_m = ResidualBlockLite(f, name="residual4", **rkw)
                for _ in range(self.n_modules):
                    ll = res_m(ll)
                ll = ConvBNReLU(f, 1, name="lin", **kw)(ll)
                head_out = Conv(
                    self.out_channels, 1, 1, 0, name="conv2", **ckw
                )(ll)
                if self.variant == "plain":
                    stack_out, return_feed = head_out, head_out
                else:
                    stack_out = apply_merge(head_out)
                    return_feed = (
                        head_out
                        if self.variant == "skeleton_from_keypoints"
                        else stack_out
                    )
                new_inter = (
                    Conv(f, 1, 1, 0, name="conv3", **ckw)(ll)
                    + Conv(f, 1, 1, 0, name="conv4", **ckw)(return_feed)
                )
                return new_inter, stack_out

            if self.remat:
                stack_body = nn.remat(
                    stack_body,
                    prevent_cse=self.remat_prevent_cse,
                    policy=policy,
                )
            # Running BN statistics are a sequential dependence across
            # stacks (each of the 8 calls compounds the EMA), so in training
            # they ride the scan carry; in eval they are read-only and
            # broadcast like the params.
            if self.use_running_average:
                broadcast, carry_cols = ("params", "batch_stats"), ()
            else:
                broadcast, carry_cols = ("params",), ("batch_stats",)
            if self.is_initializing():
                # Trace the body ONCE outside lax.scan so every param and BN
                # variable is created before scan checks its carry structure
                # (shapes don't depend on the iteration index).
                _, stack_out = stack_body(self, inter, None)
                return [stack_out] * self.n_stack
            scan_fn = nn.scan(
                stack_body,
                variable_broadcast=broadcast,
                variable_carry=carry_cols,
                split_rngs={"params": False},
                length=self.n_stack,
            )
            _, stacked = scan_fn(self, inter, None)
            return [stacked[i] for i in range(self.n_stack)]

        # Merge matrix seen by the RETURN path (conv4's input): identity for
        # 'plain'/'skeleton_from_keypoints' (return_feed = head_out), the full
        # merge for the *_merge variants (return_feed = merged stack_out).
        mr_fold = (
            m
            if self.variant in ("skeleton_merge", "skeleton_from_keypoints_merge")
            else None
        )
        fold_wb = None
        outs = []
        for i, (hg_m, res_list, lin_m, head_m, ret_ll_m, ret_out_m) in enumerate(stack_mods):
            ll = hg_m(inter)
            for res_m in res_list:
                ll = res_m(ll)
            ll = lin_m(ll)
            if use_fold and i < self.n_stack - 1:
                if fold_wb is None or not self.share_weights:
                    names = (
                        ("conv2", "conv3", "conv4")
                        if self.share_weights
                        else (f"conv2_{i}", f"conv3_{i}", f"conv4_{i}")
                    )
                    fold_wb = self._fold_tail_wb(names, mr_fold)
                wf, bf = fold_wb
                inter = (
                    jax.lax.dot_general(ll, wf, (((3,), (0,)), ((), ()))) + bf
                )
                continue
            head_out = head_m(ll)

            if self.variant == "plain":
                stack_out, return_feed = head_out, head_out
            elif self.variant == "skeleton_from_keypoints":
                # kp channels pass through; appended sk[e] = kp[sks[e,0]+1]
                # + kp[sks[e,1]+1] (channel 0 = background); only the
                # keypoint half feeds the return conv
                # (/root/reference/try_skeleton_from_keypoints.py:274-283).
                stack_out = apply_merge(head_out)
                return_feed = head_out
            elif self.variant == "skeleton_from_keypoints_merge":
                # Same derivation, but the derived skeleton is fed back
                # through the return conv together with the keypoints
                # (/root/reference/try_skeleton_from_keypoints_merge.py:278,303:
                # conv4's input channels grow by the edge count).
                stack_out = apply_merge(head_out)
                return_feed = stack_out
            elif self.variant == "skeleton_merge":
                # out[..., base:] = out[..., base:] - out[..., 0:1]
                #                   + out[..., sks[:,0]] + out[..., sks[:,1]]
                # where base = 19 in the reference 38-ch config (out_channels
                # minus the number of skeleton edges; torch in-place
                # semantics, /root/reference/try_skeleton_and_keypoints.py:270-298).
                stack_out = apply_merge(head_out)
                return_feed = stack_out
            else:
                raise ValueError(f"unknown variant {self.variant!r}")

            outs.append(stack_out)
            if i < self.n_stack - 1:
                inter = ret_ll_m(ll) + ret_out_m(return_feed)
        return outs


class TwoStackProgressive(nn.Module):
    """The 2-stack progressive ablation — BASELINE config 2
    (/root/reference/try_different_stack_without_skeleton.py:281-328).

    Same family as :class:`StackedHourglass` (Lite residuals, maxpool/add
    recursive hourglass, ONE hourglass/residual4/lin shared across both
    stacks) but with per-stack head channels and a different feature return:
    stack 0 emits the 2-ch background mask (``conv2_0``, bias-free) and the
    next stack's input is ``conv4_0(concat[ll, out0])`` (BIASED, line 294);
    stack 1 emits the keypoint head (``conv2_1``, bias-free, nKeypoint=17 —
    an MSE-on-Gaussians head, per the script's declared losses; see
    train/objectives.progressive_2stage_objective for the loss-block
    rationale).
    """

    features: int = 256
    out_channels: Sequence[int] = (2, 17)
    n_modules: int = 2
    hourglass_depth: int = 4
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    remat: bool = False
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
        HG = nn.remat(RecursiveHourglass) if self.remat else RecursiveHourglass

        # Stem (try_different_stack_without_skeleton.py:285-290, forward
        # 299-305): conv7x7/2 → ReLU → ResidualLite(128) → maxpool →
        # ResidualLite(128) → ResidualLite(f).
        y = Conv(64, 7, 2, 3, name="conv1", **ckw)(x)
        y = nn.relu(y)
        y = ResidualBlockLite(128, name="residual1", **kw)(y)
        y = max_pool_2x2(y)
        y = ResidualBlockLite(128, name="residual2", **kw)(y)
        inter = ResidualBlockLite(f, name="residual3", **kw)(y)

        hourglass = HG(
            f, self.hourglass_depth, self.n_modules, share_weights=True,
            name="hourglass1", **kw,
        )
        residual4 = ResidualBlockLite(f, name="residual4", **kw)
        lin = ConvBNReLU(f, 1, name="lin", **kw)

        outs = []
        for i, c in enumerate(self.out_channels):
            ll = hourglass(inter)
            for _ in range(self.n_modules):
                ll = residual4(ll)
            ll = lin(ll)
            head_out = Conv(
                c, 1, 1, 0, use_bias=False, name=f"conv2_{i}", **ckw
            )(ll)
            outs.append(head_out)
            if i < len(self.out_channels) - 1:
                merged = jnp.concatenate([ll, head_out], axis=-1)
                inter = Conv(f, 1, 1, 0, name=f"conv4_{i}", **ckw)(merged)
        return outs


class RefinerD(nn.Module):
    """``creatModelD`` (/root/reference/only_one_hourgless.py:257-283): a
    64x64 refinement hourglass whose input is the concatenation of predicted
    heatmaps and the (downsampled) image, producing refined heatmaps.
    """

    features: int = 256
    out_channels: int = 17
    n_modules: int = 2
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

        y = Conv(64, 3, 1, 1, name="conv1", **ckw)(x)
        y = nn.relu(y)
        y = ResidualBlockLite(128, name="residual1", **kw)(y)
        y = ResidualBlockLite(128, name="residual2", **kw)(y)
        y = ResidualBlockLite(f, name="residual3", **kw)(y)
        y = RecursiveHourglass(
            f, self.hourglass_depth, self.n_modules, share_weights=True, name="hourglass", **kw
        )(y)
        res = ResidualBlockLite(f, name="residual4", **kw)
        for _ in range(self.n_modules):
            y = res(y)
        y = ConvBNReLU(f, 1, name="lin", **kw)(y)
        return Conv(self.out_channels, 1, 1, 0, name="conv2", **ckw)(y)
