"""End-to-end numerical parity vs torch implementations of the reference
architecture (the BASELINE north star: heatmap outputs matched at fp32
tolerance).

The torch models below are independent transcriptions of the reference
semantics (/root/reference/train.py:411-601) written for this test; weights
are copied torch→flax (OIHW→HWIO) and outputs compared in eval mode (both
frameworks then use identical running statistics, isolating op semantics
from BN-momentum bookkeeping differences).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.models import (
    ClassicStackedHourglass,
    ProgressiveHourglass,
)

FEATS = 32
DEPTH = 4  # full 4-level hourglass, like the reference
DILATIONS = (1, 6, 12, 18)  # the reference ASPP rates (train.py:469)


# --------------------------------------------------------------------------
# Torch reference-semantics modules (transcribed from train.py:411-601)
# --------------------------------------------------------------------------


class TResidual(tnn.Module):
    """Pre-act bottleneck w/ stride + BN skip, projection always taken
    (train.py:411-447 with its operator-precedence quirk in effect)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        mid = cout // 2
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, mid, 1)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, stride, 1)
        self.bn3 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1)
        self.bn4 = tnn.BatchNorm2d(cout)
        self.down_conv = tnn.Conv2d(cin, cout, 1, stride, bias=False)
        self.down_bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        y = F.relu(self.bn1(x))
        y = self.conv1(y)
        y = F.relu(self.bn2(y))
        y = self.conv2(y)
        y = F.relu(self.bn3(y))
        y = self.conv3(y)
        y = self.bn4(y)
        return y + self.down_bn(self.down_conv(x))


class TASPP(tnn.Module):
    """ASPP bottleneck (train.py:465-495)."""

    def __init__(self, c, dilations):
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
        self.project_bn = tnn.BatchNorm2d(c)

    def forward(self, x):
        b1 = F.relu(self.aspp1_bn(self.aspp1(x)))
        b2 = F.relu(self.aspp2_bn(self.aspp2(x)))
        b3 = F.relu(self.aspp3_bn(self.aspp3(x)))
        b4 = F.relu(self.aspp4_bn(self.aspp4(x)))
        g = F.adaptive_avg_pool2d(x, 1)
        g = F.relu(self.gbn(self.gconv(g)))
        g = F.interpolate(g, size=b4.shape[2:], mode="bilinear", align_corners=True)
        y = torch.cat([b1, b2, b3, b4, g], dim=1)
        return F.relu(self.project_bn(self.project(y)))


class THourglass(tnn.Module):
    """Final-model hourglass: stride-2 residual encoder, ASPP bottleneck,
    nearest-up + half-width residual + concat decoder (train.py:498-542)."""

    def __init__(self, c, depth, dilations):
        super().__init__()
        self.depth = depth
        self.down = tnn.ModuleList([TResidual(c, c, 2) for _ in range(depth)])
        self.skip = tnn.ModuleList([TResidual(c, c // 2) for _ in range(depth)])
        self.up = tnn.ModuleList([TResidual(c, c // 2) for _ in range(depth)])
        self.aspp = TASPP(c, dilations)

    def forward(self, x):
        skips = []
        for i in range(self.depth):
            skips.append(self.skip[i](x))
            x = self.down[i](x)
        out = self.aspp(x)
        for i in reversed(range(self.depth)):
            out = F.interpolate(out, scale_factor=2)  # nearest
            out = self.up[i](out)
            out = torch.cat([out, skips[i]], dim=1)
        return out


class TProgressive(tnn.Module):
    """3-stage progressive model (train.py:545-601)."""

    def __init__(self, c, out_channels, depth, dilations):
        super().__init__()
        self.stem_conv = tnn.Conv2d(3, 64, 7, 2, 3)
        self.stem_res1 = TResidual(64, 128, 2)
        self.stem_res2 = TResidual(128, 128)
        self.stem_res3 = TResidual(128, c)
        self.stages = tnn.ModuleList(
            [THourglass(c, depth, dilations) for _ in out_channels]
        )
        self.outs = tnn.ModuleList(
            [tnn.Conv2d(c, n, 1, bias=False) for n in out_channels]
        )
        self.rets = tnn.ModuleList(
            [tnn.Conv2d(n, c // 2, 1, bias=False) for n in out_channels[:-1]]
        )
        self.rets2 = tnn.ModuleList(
            [tnn.Conv2d(c, c // 4, 1, bias=False) for _ in out_channels[:-1]]
        )
        self.downf = tnn.ModuleList(
            [tnn.Conv2d(c, c // 4, 1, bias=False) for _ in out_channels[:-1]]
        )

    def forward(self, x):
        inter = self.stem_res3(
            self.stem_res2(self.stem_res1(F.relu(self.stem_conv(x))))
        )
        outs = []
        for i, (stage, head) in enumerate(zip(self.stages, self.outs)):
            ll = stage(inter)
            logits = head(ll)
            outs.append(logits)
            if i < len(self.stages) - 1:
                inter = torch.cat(
                    [self.rets[i](logits), self.rets2[i](ll), self.downf[i](inter)],
                    dim=1,
                )
        return outs


# --------------------------------------------------------------------------
# Weight transfer torch → flax
# --------------------------------------------------------------------------


def t2j_conv(conv: tnn.Conv2d):
    p = {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(conv.bias.detach().numpy())
    return p


def t2j_bn(bn: tnn.BatchNorm2d):
    params = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
    }
    stats = {
        "mean": jnp.asarray(bn.running_mean.detach().numpy()),
        "var": jnp.asarray(bn.running_var.detach().numpy()),
    }
    return params, stats


def residual_vars(t: TResidual):
    params, stats = {}, {}
    for name in ["bn1", "bn2", "bn3", "bn4", "down_bn"]:
        p, s = t2j_bn(getattr(t, name))
        params[name] = {"bn": p}
        stats[name] = {"bn": s}
    for name in ["conv1", "conv2", "conv3", "down_conv"]:
        params[name] = {"conv": t2j_conv(getattr(t, name))}
    return params, stats


def cbr_vars(conv, bn):
    p, s = t2j_bn(bn)
    return (
        {"conv": {"conv": t2j_conv(conv)}, "bn": {"bn": p}},
        {"bn": {"bn": s}},
    )


def aspp_vars(t: TASPP):
    params, stats = {}, {}
    for i in range(1, 5):
        params[f"aspp{i}"], stats[f"aspp{i}"] = cbr_vars(
            getattr(t, f"aspp{i}"), getattr(t, f"aspp{i}_bn")
        )
    params["global_branch"], stats["global_branch"] = cbr_vars(t.gconv, t.gbn)
    params["project"], stats["project"] = cbr_vars(t.project, t.project_bn)
    return params, stats


def hourglass_vars(t: THourglass):
    params, stats = {}, {}
    for i in range(t.depth):
        params[f"downsample{i + 1}"], stats[f"downsample{i + 1}"] = residual_vars(
            t.down[i]
        )
        params[f"residual{i + 1}"], stats[f"residual{i + 1}"] = residual_vars(
            t.skip[i]
        )
        params[f"upsample{i + 1}"], stats[f"upsample{i + 1}"] = residual_vars(t.up[i])
    params["aspp"], stats["aspp"] = aspp_vars(t.aspp)
    return params, stats


def progressive_vars(t: TProgressive):
    params, stats = {}, {}
    stem_p, stem_s = {}, {}
    stem_p["conv1"] = {"conv": t2j_conv(t.stem_conv)}
    for i, res in enumerate([t.stem_res1, t.stem_res2, t.stem_res3], 1):
        stem_p[f"residual{i}"], stem_s[f"residual{i}"] = residual_vars(res)
    params["preprocess1"], stats["preprocess1"] = stem_p, stem_s
    for i, stage in enumerate(t.stages, 1):
        params[f"stage{i}"], stats[f"stage{i}"] = hourglass_vars(stage)
        params[f"stage{i}_out"] = {"conv": t2j_conv(t.outs[i - 1])}
        if i <= len(t.rets):
            params[f"stage{i}_return"] = {"conv": t2j_conv(t.rets[i - 1])}
            params[f"stage{i}_return_2"] = {"conv": t2j_conv(t.rets2[i - 1])}
            params[f"stage{i}_down_feature"] = {"conv": t2j_conv(t.downf[i - 1])}
    return {"params": params, "batch_stats": stats}


def randomize_bn_stats(module: tnn.Module, rng):
    """Give BN layers nontrivial running stats so eval mode is a real check."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.normal(0, 0.3, m.running_mean.shape).astype("f"))
            )
            m.running_var.copy_(
                torch.from_numpy(rng.uniform(0.5, 2.0, m.running_var.shape).astype("f"))
            )


class TestProgressiveParity:
    def test_full_model_fp32(self, rng):
        torch.manual_seed(0)
        out_channels = (2, 16, 17)
        tmodel = TProgressive(FEATS, out_channels, DEPTH, DILATIONS).eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        jmodel = ProgressiveHourglass(
            features=FEATS,
            out_channels=out_channels,
            hourglass_depth=DEPTH,
            use_running_average=True,
            dtype=jnp.float32,
        )
        # Validate the variable structure matches before substituting.
        ref_vars = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = progressive_vars(tmodel)
        ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
        got_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(got["params"])[0]}
        assert ref_paths == got_paths, (
            f"missing: {sorted(map(str, ref_paths - got_paths))[:5]} "
            f"extra: {sorted(map(str, got_paths - ref_paths))[:5]}"
        )

        j_outs = jmodel.apply(got, jnp.asarray(x))

        for i, (t_o, j_o) in enumerate(zip(t_outs, j_outs)):
            t_np = np.transpose(t_o.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(j_o), t_np, rtol=1e-4, atol=1e-4,
                err_msg=f"stage {i} mismatch",
            )


# --------------------------------------------------------------------------
# Classic Newell baseline (hourglass_compare.py:492-638)
# --------------------------------------------------------------------------


class TClassicHourglass(tnn.Module):
    def __init__(self, c, depth):
        super().__init__()
        self.depth = depth
        self.down = tnn.ModuleList([TResidual(c, c) for _ in range(depth)])
        self.skip = tnn.ModuleList([TResidual(c, c) for _ in range(depth)])
        self.up = tnn.ModuleList([TResidual(c, c) for _ in range(depth)])
        self.bottleneck = TResidual(c, c)

    def forward(self, x):
        skips = []
        for i in range(self.depth):
            skips.append(self.skip[i](x))
            x = self.down[i](F.max_pool2d(x, 2, 2))
        out = self.bottleneck(x)
        for i in reversed(range(self.depth)):
            out = self.up[i](out)
            out = F.interpolate(out, scale_factor=2)
            out = out + skips[i]
        return out


class TClassic(tnn.Module):
    def __init__(self, c, n_stack, n_out, depth):
        super().__init__()
        self.stem_conv = tnn.Conv2d(3, 64, 7, 2, 3)
        self.stem_bn = tnn.BatchNorm2d(64)
        self.stem_res1 = TResidual(64, 128)
        self.stem_res2 = TResidual(128, 128)
        self.stem_res3 = TResidual(128, c)
        self.hg = tnn.ModuleList([TClassicHourglass(c, depth) for _ in range(n_stack)])
        self.res = tnn.ModuleList([TResidual(c, c) for _ in range(n_stack)])
        self.lin_conv = tnn.ModuleList([tnn.Conv2d(c, c, 1) for _ in range(n_stack)])
        self.lin_bn = tnn.ModuleList([tnn.BatchNorm2d(c) for _ in range(n_stack)])
        self.outs = tnn.ModuleList(
            [tnn.Conv2d(c, n_out, 1, bias=False) for _ in range(n_stack)]
        )
        self.rets = tnn.ModuleList(
            [tnn.Conv2d(n_out, c, 1, bias=False) for _ in range(n_stack - 1)]
        )
        self.downf = tnn.ModuleList(
            [tnn.Conv2d(c, c, 1, bias=False) for _ in range(n_stack - 1)]
        )
        self.n_stack = n_stack

    def forward(self, x):
        y = F.relu(self.stem_bn(self.stem_conv(x)))
        y = self.stem_res1(y)
        y = F.max_pool2d(y, 2, 2)
        inter = self.stem_res3(self.stem_res2(y))
        outs = []
        for i in range(self.n_stack):
            ll = self.hg[i](inter)
            ll = self.res[i](ll)
            ll = F.relu(self.lin_bn[i](self.lin_conv[i](ll)))
            logits = self.outs[i](ll)
            outs.append(logits)
            if i < self.n_stack - 1:
                inter = self.rets[i](logits) + inter + self.downf[i](ll)
        return outs


def classic_hg_vars(t: TClassicHourglass):
    params, stats = {}, {}
    for i in range(t.depth):
        params[f"downsample{i + 1}"], stats[f"downsample{i + 1}"] = residual_vars(
            t.down[i]
        )
        params[f"residual{i + 1}"], stats[f"residual{i + 1}"] = residual_vars(t.skip[i])
        params[f"upsample{i + 1}"], stats[f"upsample{i + 1}"] = residual_vars(t.up[i])
    params[f"residual{t.depth + 1}"], stats[f"residual{t.depth + 1}"] = residual_vars(
        t.bottleneck
    )
    return params, stats


def classic_vars(t: TClassic):
    params, stats = {}, {}
    params["stem_conv1"] = {"conv": t2j_conv(t.stem_conv)}
    bnp, bns = t2j_bn(t.stem_bn)
    params["stem_bn1"], stats["stem_bn1"] = {"bn": bnp}, {"bn": bns}
    for i, res in enumerate([t.stem_res1, t.stem_res2, t.stem_res3], 1):
        params[f"stem_residual{i}"], stats[f"stem_residual{i}"] = residual_vars(res)
    for i in range(1, t.n_stack + 1):
        params[f"stage{i}_hourglass"], stats[f"stage{i}_hourglass"] = classic_hg_vars(
            t.hg[i - 1]
        )
        params[f"stage{i}_residual"], stats[f"stage{i}_residual"] = residual_vars(
            t.res[i - 1]
        )
        params[f"stage{i}_conv"] = {"conv": t2j_conv(t.lin_conv[i - 1])}
        bnp, bns = t2j_bn(t.lin_bn[i - 1])
        params[f"stage{i}_bn"], stats[f"stage{i}_bn"] = {"bn": bnp}, {"bn": bns}
        params[f"stage{i}_out"] = {"conv": t2j_conv(t.outs[i - 1])}
        if i < t.n_stack:
            params[f"stage{i}_return"] = {"conv": t2j_conv(t.rets[i - 1])}
            params[f"stage{i}_down_feature"] = {"conv": t2j_conv(t.downf[i - 1])}
    return {"params": params, "batch_stats": stats}


class TestClassicParity:
    def test_two_stack_fp32(self, rng):
        torch.manual_seed(1)
        tmodel = TClassic(FEATS, 2, 16, depth=2).eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        jmodel = ClassicStackedHourglass(
            features=FEATS,
            n_stack=2,
            out_channels=16,
            hourglass_depth=2,
            use_running_average=True,
            dtype=jnp.float32,
        )
        ref_vars = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = classic_vars(tmodel)
        ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
        got_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(got["params"])[0]}
        assert ref_paths == got_paths, (
            f"missing: {sorted(map(str, ref_paths - got_paths))[:5]} "
            f"extra: {sorted(map(str, got_paths - ref_paths))[:5]}"
        )

        j_outs = jmodel.apply(got, jnp.asarray(x))
        for i, (t_o, j_o) in enumerate(zip(t_outs, j_outs)):
            t_np = np.transpose(t_o.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(j_o), t_np, rtol=1e-4, atol=1e-4,
                err_msg=f"stack {i} mismatch",
            )


# --------------------------------------------------------------------------
# Cat-merge ("removed max-pool") family: try_costomer_loss.py:227-330 /
# try_with_aspp_remove_max_pool.py:209-301
# --------------------------------------------------------------------------


class TCatMergeHourglass(tnn.Module):
    """Per level: untouched skip, ONE stride-2 residual down, ONE residual
    below the recursion, bilinear align-corners up, cat + bias-free 1x1."""

    def __init__(self, c, n):
        super().__init__()
        self.rs = TResidual(c, c, 2)
        self.r = TResidual(c, c)
        self.inner = TCatMergeHourglass(c, n - 1) if n > 1 else None
        self.conv2 = tnn.Conv2d(2 * c, c, 1, bias=False)

    def forward(self, x):
        up1 = x
        low1 = self.rs(x)
        low2 = self.inner(low1) if self.inner is not None else low1
        low3 = self.r(low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="bilinear",
                            align_corners=True)
        return self.conv2(torch.cat([up1, up2], dim=1))


class TCatMergeProgressive(tnn.Module):
    """creatModel of the cat-merge scripts; ``gate`` selects the
    try_costomer (gated) vs remove_max_pool (logits-join) first return."""

    def __init__(self, c, out_channels, depth, gate):
        super().__init__()
        c0, c1, c2 = out_channels
        self.gate = gate
        self.stem_conv = tnn.Conv2d(3, 64, 7, 2, 3)
        self.stem_res1 = TResidual(64, 128, 2)
        self.stem_res2 = TResidual(128, 128)
        self.stem_res3 = TResidual(128, c)
        self.hourglass1 = TCatMergeHourglass(c, depth)
        self.residual4 = TResidual(c, c)
        self.lin_conv = tnn.Conv2d(c, c, 1)
        self.lin_bn = tnn.BatchNorm2d(c)
        self.conv2_0 = tnn.Conv2d(c, c0, 1, bias=False)
        ret0_in = 2 * c if gate else 2 * c + c0
        self.conv4_0 = tnn.Conv2d(ret0_in, c, 1)  # the only biased head conv
        self.conv2_1 = tnn.Conv2d(c, c1, 1, bias=False)
        self.conv4_1 = tnn.Conv2d(2 * c + c1, c, 1, bias=False)
        self.conv2_2 = tnn.Conv2d(c, c2, 1, bias=False)

    def forward(self, x):
        inter = self.stem_res3(
            self.stem_res2(self.stem_res1(F.relu(self.stem_conv(x))))
        )
        outs = []
        for i in range(3):
            ll = F.relu(self.lin_bn(self.lin_conv(
                self.residual4(self.hourglass1(inter))
            )))
            if i == 0:
                out = self.conv2_0(ll)
                if self.gate:
                    g = torch.argmax(out, dim=1, keepdim=True).float()
                    inter = self.conv4_0(torch.cat([inter, ll], dim=1) * g)
                else:
                    inter = self.conv4_0(torch.cat([inter, ll, out], dim=1))
            elif i == 1:
                out = self.conv2_1(ll)
                inter = self.conv4_1(torch.cat([inter, ll, out], dim=1))
            else:
                out = self.conv2_2(ll)
            outs.append(out)
        return outs


def catmerge_hourglass_vars(t: TCatMergeHourglass, prefix=""):
    params, stats = {}, {}
    params[f"{prefix}residual_stride"], stats[f"{prefix}residual_stride"] = (
        residual_vars(t.rs)
    )
    params[f"{prefix}residual"], stats[f"{prefix}residual"] = residual_vars(t.r)
    params[f"{prefix}conv2"] = {"conv": t2j_conv(t.conv2)}
    if t.inner is not None:
        p, s = catmerge_hourglass_vars(t.inner, f"{prefix}inner_")
        params.update(p)
        stats.update(s)
    return params, stats


def catmerge_vars(t: TCatMergeProgressive):
    params, stats = {}, {}
    stem_p, stem_s = {}, {}
    stem_p["conv1"] = {"conv": t2j_conv(t.stem_conv)}
    for i, res in enumerate([t.stem_res1, t.stem_res2, t.stem_res3], 1):
        stem_p[f"residual{i}"], stem_s[f"residual{i}"] = residual_vars(res)
    params["preprocess1"], stats["preprocess1"] = stem_p, stem_s
    params["hourglass1"], stats["hourglass1"] = catmerge_hourglass_vars(t.hourglass1)
    params["residual4"], stats["residual4"] = residual_vars(t.residual4)
    params["lin"], stats["lin"] = cbr_vars(t.lin_conv, t.lin_bn)
    for name in ["conv2_0", "conv4_0", "conv2_1", "conv4_1", "conv2_2"]:
        params[name] = {"conv": t2j_conv(getattr(t, name))}
    return {"params": params, "batch_stats": stats}


class TestCatMergeParity:
    @pytest.mark.parametrize("gate", [True, False])
    def test_full_model_fp32(self, rng, gate):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            GatedRecursiveProgressive,
        )

        torch.manual_seed(3)
        out_channels = (2, 20, 17)
        depth = 2
        tmodel = TCatMergeProgressive(FEATS, out_channels, depth, gate).eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        jmodel = GatedRecursiveProgressive(
            features=FEATS,
            out_channels=out_channels,
            hourglass_depth=depth,
            gate_stage0=gate,
            use_running_average=True,
            dtype=jnp.float32,
        )
        ref_vars = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = catmerge_vars(tmodel)
        ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
        got_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(got["params"])[0]}
        assert ref_paths == got_paths, (
            f"missing: {sorted(map(str, ref_paths - got_paths))[:5]} "
            f"extra: {sorted(map(str, got_paths - ref_paths))[:5]}"
        )

        j_outs = jmodel.apply(got, jnp.asarray(x))
        for i, (t_o, j_o) in enumerate(zip(t_outs, j_outs)):
            t_np = np.transpose(t_o.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(j_o), t_np, rtol=2e-4, atol=2e-4,
                err_msg=f"stage {i} mismatch (gate={gate})",
            )
