"""Torch-parity for the recursive (try_*) model family: the flagship
``skeleton_merge`` in-place channel arithmetic
(/root/reference/try_skeleton_and_keypoints.py:270-298) and the
recursive-ASPP progressive model (/root/reference/try_more_layer.py:315-363),
including the per-LEVEL residual weight sharing of the reference's nested
``hourglass`` modules (only_one_hourgless.py:168-196) and the bilinear
align_corners=True upsample."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.models import (
    COCO_SKELETON,
    ProgressiveRecursiveASPP,
    StackedHourglass,
)

FEATS = 32
DEPTH = 2
NMOD = 2
DILATIONS = (1, 6, 12, 18)


# --------------------------------------------------------------------------
# Torch transcriptions (try_* family semantics)
# --------------------------------------------------------------------------


class TLite(tnn.Module):
    """Early-variant residual (only_one_hourgless.py:135-166): biased convs,
    biased 1x1 projection only on channel change, no trailing BN."""

    def __init__(self, cin, cout):
        super().__init__()
        mid = cout // 2
        self.cin, self.cout = cin, cout
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, mid, 1)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, 1, 1)
        self.bn3 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1)
        if cin != cout:
            self.conv4 = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        y = self.conv1(F.relu(self.bn1(x)))
        y = self.conv2(F.relu(self.bn2(y)))
        y = self.conv3(F.relu(self.bn3(y)))
        return y + (self.conv4(x) if self.cin != self.cout else x)


class TASPPBare(tnn.Module):
    """try_more_layer.py:258-290 ASPP: BN+ReLU branches, BARE 1x1 project."""

    def __init__(self, c, dilations=DILATIONS):
        super().__init__()
        d1, d2, d3, d4 = dilations
        self.aspp1 = tnn.Conv2d(c, c, 1, bias=False)
        self.aspp1_bn = tnn.BatchNorm2d(c)
        self.aspp2 = tnn.Conv2d(c, c, 3, padding=d2, dilation=d2, bias=False)
        self.aspp2_bn = tnn.BatchNorm2d(c)
        self.aspp3 = tnn.Conv2d(c, c, 3, padding=d3, dilation=d3, bias=False)
        self.aspp3_bn = tnn.BatchNorm2d(c)
        self.aspp4 = tnn.Conv2d(c, c, 3, padding=d4, dilation=d4, bias=False)
        self.aspp4_bn = tnn.BatchNorm2d(c)
        self.gconv = tnn.Conv2d(c, c, 1, bias=False)
        self.gbn = tnn.BatchNorm2d(c)
        self.project = tnn.Conv2d(5 * c, c, 1, bias=False)

    def forward(self, x):
        b1 = F.relu(self.aspp1_bn(self.aspp1(x)))
        b2 = F.relu(self.aspp2_bn(self.aspp2(x)))
        b3 = F.relu(self.aspp3_bn(self.aspp3(x)))
        b4 = F.relu(self.aspp4_bn(self.aspp4(x)))
        g = F.adaptive_avg_pool2d(x, 1)
        g = F.relu(self.gbn(self.gconv(g)))
        g = F.interpolate(g, size=b4.shape[2:], mode="bilinear",
                          align_corners=True)
        return self.project(torch.cat([b1, b2, b3, b4, g], dim=1))


class TRecHourglass(tnn.Module):
    """Recursive hourglass: per-LEVEL shared residual_block, maxpool down,
    bilinear align_corners=True up (only_one_hourgless.py:168-196;
    ASPP-bottleneck form try_more_layer.py:249-296)."""

    def __init__(self, n, f, n_modules=NMOD, aspp=False):
        super().__init__()
        self.n = n
        self.n_modules = n_modules
        self.residual_block = TLite(f, f)
        if n > 1:
            self.hourglass1 = TRecHourglass(n - 1, f, n_modules, aspp)
        elif aspp:
            self.aspp = TASPPBare(f)
        self.has_aspp = aspp and n == 1

    def mods(self, x):
        for _ in range(self.n_modules):
            x = self.residual_block(x)
        return x

    def forward(self, x):
        up1 = self.mods(x)
        low1 = self.mods(F.max_pool2d(x, 2))
        if self.n > 1:
            low2 = self.hourglass1(low1)
        elif self.has_aspp:
            low2 = self.aspp(low1)
        else:
            low2 = self.mods(low1)
        low3 = self.mods(low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="bilinear",
                            align_corners=True)
        return up1 + up2


class TLin(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv = tnn.Conv2d(f, f, 1)
        self.bn = tnn.BatchNorm2d(f)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TSkelMerge(tnn.Module):
    """try_skeleton_and_keypoints.py:242-298 (nOutChannels=38)."""

    def __init__(self, f, n_stack, out_channels, sks, depth=DEPTH):
        super().__init__()
        self.n_stack = n_stack
        self.sks = sks
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3)
        self.residual1 = TLite(64, 128)
        self.residual2 = TLite(128, 128)
        self.residual3 = TLite(128, f)
        self.hourglass1 = TRecHourglass(depth, f)
        self.residual4 = TLite(f, f)
        self.lin = TLin(f)
        self.conv2 = tnn.Conv2d(f, out_channels, 1)
        self.conv3 = tnn.Conv2d(f, f, 1)
        self.conv4 = tnn.Conv2d(out_channels, f, 1)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = self.residual1(x)
        x = F.max_pool2d(x, 2)
        inter = self.residual3(self.residual2(x))
        out = []
        for i in range(self.n_stack):
            ll = self.hourglass1(inter)
            for _ in range(NMOD):
                ll = self.residual4(ll)
            ll = self.lin(ll)
            tmpOut = self.conv2(ll)
            out.insert(i, tmpOut)
            # in-place merge, verbatim semantics (lines 279-298)
            ll_ = self.conv3(ll)
            tmpOut[:, 19:, :, :] = (
                (tmpOut[:, 19:, :, :].permute(1, 0, 2, 3)
                 - tmpOut[:, 0, :, :]).permute(1, 0, 2, 3)
                + tmpOut[:, self.sks, :, :][:, :, 0, :, :]
                + tmpOut[:, self.sks, :, :][:, :, 1, :, :]
            )
            tmpOut_ = self.conv4(tmpOut)
            inter = ll_ + tmpOut_
        return out


class TProgRecASPP(tnn.Module):
    """try_more_layer.py:315-363 (4 stacks, ASPP bottleneck, i>=2 kp head)."""

    def __init__(self, f, n_stack, out_channels, depth=DEPTH):
        super().__init__()
        c0, c1, c2 = out_channels
        self.n_stack = n_stack
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3)
        self.residual1 = TLite(64, 128)
        self.residual2 = TLite(128, 128)
        self.residual3 = TLite(128, f)
        self.hourglass1 = TRecHourglass(depth, f, aspp=True)
        self.residual4 = TLite(f, f)
        self.lin = TLin(f)
        self.conv2_0 = tnn.Conv2d(f, c0, 1, bias=False)
        self.conv4_0 = tnn.Conv2d(f + c0, f, 1)  # biased (line 330)
        self.conv2_1 = tnn.Conv2d(f, c1, 1, bias=False)
        self.conv4_1 = tnn.Conv2d(f + c1, f, 1, bias=False)
        self.conv2_2 = tnn.Conv2d(f, c2, 1, bias=False)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = self.residual1(x)
        x = F.max_pool2d(x, 2)
        inter = self.residual3(self.residual2(x))
        out = []
        for i in range(self.n_stack):
            ll = self.hourglass1(inter)
            for _ in range(NMOD):
                ll = self.residual4(ll)
            ll = self.lin(ll)
            if i == 0:
                tmpOut = self.conv2_0(ll)
                inter = self.conv4_0(torch.cat([ll, tmpOut], dim=1))
            elif i == 1:
                tmpOut = self.conv2_1(ll)
                inter = self.conv4_1(torch.cat([ll, tmpOut], dim=1))
            else:
                tmpOut = self.conv2_2(ll)
            out.insert(i, tmpOut)
        return out


# --------------------------------------------------------------------------
# Weight transfer torch → flax
# --------------------------------------------------------------------------


def t2j_conv(conv):
    p = {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(conv.bias.detach().numpy())
    return p


def t2j_bn(bn):
    return (
        {"scale": jnp.asarray(bn.weight.detach().numpy()),
         "bias": jnp.asarray(bn.bias.detach().numpy())},
        {"mean": jnp.asarray(bn.running_mean.detach().numpy()),
         "var": jnp.asarray(bn.running_var.detach().numpy())},
    )


def lite_vars(t: TLite):
    params, stats = {}, {}
    for name in ["bn1", "bn2", "bn3"]:
        p, s = t2j_bn(getattr(t, name))
        params[name] = {"bn": p}
        stats[name] = {"bn": s}
    for name in ["conv1", "conv2", "conv3"]:
        params[name] = {"conv": t2j_conv(getattr(t, name))}
    if t.cin != t.cout:
        params["conv4"] = {"conv": t2j_conv(t.conv4)}
    return params, stats


def cbr_vars(conv, bn):
    p, s = t2j_bn(bn)
    return ({"conv": {"conv": t2j_conv(conv)}, "bn": {"bn": p}},
            {"bn": {"bn": s}})


def aspp_bare_vars(t: TASPPBare):
    params, stats = {}, {}
    for i in range(1, 5):
        params[f"aspp{i}"], stats[f"aspp{i}"] = cbr_vars(
            getattr(t, f"aspp{i}"), getattr(t, f"aspp{i}_bn"))
    params["global_branch"], stats["global_branch"] = cbr_vars(t.gconv, t.gbn)
    params["project"] = {"conv": t2j_conv(t.project)}
    return params, stats


def rec_hourglass_vars(t: TRecHourglass):
    """Level n's residual_block → flax name residual_block_n{n}."""
    params, stats = {}, {}
    node = t
    while True:
        p, s = lite_vars(node.residual_block)
        params[f"residual_block_n{node.n}"] = p
        stats[f"residual_block_n{node.n}"] = s
        if node.n > 1:
            node = node.hourglass1
        else:
            if node.has_aspp:
                params["aspp"], stats["aspp"] = aspp_bare_vars(node.aspp)
            break
    return params, stats


def stem_vars(t, params, stats):
    params["conv1"] = {"conv": t2j_conv(t.conv1)}
    for name in ["residual1", "residual2", "residual3"]:
        params[name], stats[name] = lite_vars(getattr(t, name))


def skel_merge_vars(t: TSkelMerge):
    params, stats = {}, {}
    stem_vars(t, params, stats)
    params["hourglass1"], stats["hourglass1"] = rec_hourglass_vars(t.hourglass1)
    params["residual4"], stats["residual4"] = lite_vars(t.residual4)
    params["lin"], stats["lin"] = cbr_vars(t.lin.conv, t.lin.bn)
    for name in ["conv2", "conv3", "conv4"]:
        params[name] = {"conv": t2j_conv(getattr(t, name))}
    return {"params": params, "batch_stats": stats}


def prog_rec_vars(t: TProgRecASPP):
    params, stats = {}, {}
    stem_vars(t, params, stats)
    params["hourglass1"], stats["hourglass1"] = rec_hourglass_vars(t.hourglass1)
    params["residual4"], stats["residual4"] = lite_vars(t.residual4)
    params["lin"], stats["lin"] = cbr_vars(t.lin.conv, t.lin.bn)
    for name in ["conv2_0", "conv4_0", "conv2_1", "conv4_1", "conv2_2"]:
        params[name] = {"conv": t2j_conv(getattr(t, name))}
    return {"params": params, "batch_stats": stats}


def randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape).astype("f")))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape).astype("f")))


def assert_trees_match(jmodel, x, got):
    ref_vars = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
    got_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(got["params"])[0]}
    assert ref_paths == got_paths, (
        f"missing: {sorted(map(str, ref_paths - got_paths))[:6]} "
        f"extra: {sorted(map(str, got_paths - ref_paths))[:6]}"
    )


class TestSkeletonMergeParity:
    def test_merge_arithmetic_fp32(self, rng):
        torch.manual_seed(2)
        sks = COCO_SKELETON.tolist()
        tmodel = TSkelMerge(FEATS, 2, 38, sks).eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        jmodel = StackedHourglass(
            features=FEATS, n_stack=2, out_channels=38,
            variant="skeleton_merge", skeleton=COCO_SKELETON,
            hourglass_depth=DEPTH, use_running_average=True, dtype=jnp.float32,
        )
        got = skel_merge_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_outs = jmodel.apply(got, jnp.asarray(x))
        for i, (t_o, j_o) in enumerate(zip(t_outs, j_outs)):
            np.testing.assert_allclose(
                np.asarray(j_o), np.transpose(t_o.numpy(), (0, 2, 3, 1)),
                rtol=1e-4, atol=1e-4, err_msg=f"stack {i} (merged) mismatch",
            )


class TestProgressiveRecursiveASPPParity:
    def test_four_stack_fp32(self, rng):
        torch.manual_seed(3)
        out_channels = (2, 20, 17)
        tmodel = TProgRecASPP(FEATS, 4, out_channels).eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        jmodel = ProgressiveRecursiveASPP(
            features=FEATS, n_stack=4, out_channels=out_channels,
            hourglass_depth=DEPTH, use_running_average=True, dtype=jnp.float32,
        )
        got = prog_rec_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_outs = jmodel.apply(got, jnp.asarray(x))
        assert len(j_outs) == 4
        for i, (t_o, j_o) in enumerate(zip(t_outs, j_outs)):
            np.testing.assert_allclose(
                np.asarray(j_o), np.transpose(t_o.numpy(), (0, 2, 3, 1)),
                rtol=1e-4, atol=1e-4, err_msg=f"stage {i} mismatch",
            )
        # stages >= 2 share head, weights, and input -> identical outputs
        # (try_more_layer.py:357-361 with weight sharing); a structural
        # property worth pinning.
        np.testing.assert_array_equal(np.asarray(j_outs[2]), np.asarray(j_outs[3]))


class TestScanStacksParity:
    """scan_stacks=True compiles the weight-shared stacks as one lax.scan;
    param tree and numerics must match the unrolled loop exactly (eval) /
    to float-reassociation tolerance (train). See StackedHourglass.scan_stacks."""

    KW = dict(features=16, n_stack=3, out_channels=38, n_modules=1,
              hourglass_depth=2, variant="skeleton_merge", dtype=jnp.float32)

    def test_param_tree_identical_and_eval_exact(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        loop = StackedHourglass(**self.KW)
        scan = StackedHourglass(scan_stacks=True, **self.KW)
        vloop = loop.init(jax.random.PRNGKey(1), x)
        vscan = scan.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(vloop)
                == jax.tree_util.tree_structure(vscan))
        le = StackedHourglass(use_running_average=True, **self.KW)
        se = StackedHourglass(use_running_average=True, scan_stacks=True, **self.KW)
        for a, b in zip(le.apply(vloop, x), se.apply(vloop, x)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_mode_bn_carry(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        loop = StackedHourglass(**self.KW)
        scan = StackedHourglass(scan_stacks=True, **self.KW)
        v = loop.init(jax.random.PRNGKey(1), x)
        o1, m1 = loop.apply(v, x, mutable=["batch_stats"])
        o2, m2 = scan.apply(v, x, mutable=["batch_stats"])
        # 8 sequential EMA updates compound in stack order under the scan
        # carry exactly as in the loop (reassociation-level tolerance only).
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            m1, m2)
        for a, b in zip(o1, o2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_scan_requires_weight_sharing(self):
        m = StackedHourglass(scan_stacks=True, share_weights=False, **{
            k: v for k, v in self.KW.items() if k != "variant"})
        with pytest.raises(ValueError, match="share_weights"):
            m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


class TTwoStack(tnn.Module):
    """try_different_stack_without_skeleton.py:281-328: 2 weight-shared
    stacks, bias-free per-stack heads, return conv4_0(cat[ll, out0])."""

    def __init__(self, f, out_channels, depth=DEPTH):
        super().__init__()
        c0, c1 = out_channels
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3)
        self.residual1 = TLite(64, 128)
        self.residual2 = TLite(128, 128)
        self.residual3 = TLite(128, f)
        self.hourglass1 = TRecHourglass(depth, f)
        self.residual4 = TLite(f, f)
        self.lin = TLin(f)
        self.conv2_0 = tnn.Conv2d(f, c0, 1, bias=False)
        self.conv4_0 = tnn.Conv2d(f + c0, f, 1)  # biased (line 294)
        self.conv2_1 = tnn.Conv2d(f, c1, 1, bias=False)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = self.residual1(x)
        x = F.max_pool2d(x, 2)
        inter = self.residual3(self.residual2(x))
        out = []
        for i in range(2):
            ll = self.hourglass1(inter)
            for _ in range(NMOD):
                ll = self.residual4(ll)
            ll = self.lin(ll)
            if i == 0:
                tmpOut = self.conv2_0(ll)
                inter = self.conv4_0(torch.cat([ll, tmpOut], dim=1))
            else:
                tmpOut = self.conv2_1(ll)
            out.append(tmpOut)
        return out


def two_stack_vars(t: TTwoStack):
    params, stats = {}, {}
    stem_vars(t, params, stats)
    params["hourglass1"], stats["hourglass1"] = rec_hourglass_vars(t.hourglass1)
    params["residual4"], stats["residual4"] = lite_vars(t.residual4)
    params["lin"], stats["lin"] = cbr_vars(t.lin.conv, t.lin.bn)
    for name in ["conv2_0", "conv4_0", "conv2_1"]:
        params[name] = {"conv": t2j_conv(getattr(t, name))}
    return {"params": params, "batch_stats": stats}


class TestTwoStackProgressiveParity:
    def test_two_stack_fp32(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            TwoStackProgressive,
        )

        torch.manual_seed(5)
        out_channels = (2, 17)
        tmodel = TTwoStack(FEATS, out_channels).eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        jmodel = TwoStackProgressive(
            features=FEATS, out_channels=out_channels, hourglass_depth=DEPTH,
            n_modules=NMOD, use_running_average=True, dtype=jnp.float32,
        )
        got = two_stack_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_outs = jmodel.apply(got, jnp.asarray(x))
        for i, (t_o, j_o) in enumerate(zip(t_outs, j_outs)):
            np.testing.assert_allclose(
                np.asarray(j_o), np.transpose(t_o.numpy(), (0, 2, 3, 1)),
                rtol=2e-4, atol=2e-4, err_msg=f"stack {i}",
            )
