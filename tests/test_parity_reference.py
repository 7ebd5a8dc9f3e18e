"""Numerical parity against the reference's ACTUAL source classes.

Unlike test_parity_torch.py (builder transcriptions), these tests import the
real model classes from /root/reference via tests/reference_source.py and
weight-transfer torch→flax, closing the parity chain on the reference's own
code (the BASELINE north star "heatmap outputs matched to fp32 tolerance"):

- train.py:411-622        ResidualBlock / ASPP_Block / hourglass / creatModel
                          / generateMask (the final progressive model)
- hourglass_compare.py:405-638  classic Newell baseline creatModel
- only_one_hourgless.py:135-283 weight-shared single-stack creatModel and the
                          creatModelD refiner (whose forward has a genuine
                          bug at line 280 — pinned by a test below)

All comparisons run in eval mode (shared randomized running stats) so op
semantics are isolated from BN-momentum bookkeeping.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from reference_source import load_reference

from progressive_process_for_human_pose_estimation_tpu.models import (
    ClassicStackedHourglass,
    MaskNet,
    ProgressiveHourglass,
    ProgressiveRecursiveASPP,
    RefinerD,
    StackedHourglass,
)

pytestmark = pytest.mark.slow  # full-width (nFeats=256) models; compile-heavy


# --------------------------------------------------------------------------
# torch → flax weight transfer, keyed to the REAL reference attribute names
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


def cbr_vars(conv, bn):
    p, s = t2j_bn(bn)
    return ({"conv": {"conv": t2j_conv(conv)}, "bn": {"bn": p}},
            {"bn": {"bn": s}})


def full_residual_vars(rb):
    """train.py:411-430 ResidualBlock: bn1-4, conv1-3, ``downsaple`` =
    Sequential(conv, bn) — note the reference's typo'd attribute name."""
    params, stats = {}, {}
    for name in ["bn1", "bn2", "bn3", "bn4"]:
        p, s = t2j_bn(getattr(rb, name))
        params[name] = {"bn": p}
        stats[name] = {"bn": s}
    for name in ["conv1", "conv2", "conv3"]:
        params[name] = {"conv": t2j_conv(getattr(rb, name))}
    params["down_conv"] = {"conv": t2j_conv(rb.downsaple[0])}
    p, s = t2j_bn(rb.downsaple[1])
    params["down_bn"] = {"bn": p}
    stats["down_bn"] = {"bn": s}
    return params, stats


def lite_residual_vars(rb):
    """only_one_hourgless.py:135-165 ResidualBlock: bn1-3, conv1-3, biased
    conv4 projection (created always, APPLIED only on channel change)."""
    params, stats = {}, {}
    for name in ["bn1", "bn2", "bn3"]:
        p, s = t2j_bn(getattr(rb, name))
        params[name] = {"bn": p}
        stats[name] = {"bn": s}
    for name in ["conv1", "conv2", "conv3"]:
        params[name] = {"conv": t2j_conv(getattr(rb, name))}
    if rb.numIn != rb.numOut:
        params["conv4"] = {"conv": t2j_conv(rb.conv4)}
    return params, stats


def aspp_vars(ab):
    """train.py:465-483 ASPP_Block: _ASPPModule branches (atrous_conv + bn),
    global_avg_pool Sequential[1:3], project Sequential ``conv1``[0:2]."""
    params, stats = {}, {}
    for i in range(1, 5):
        mod = getattr(ab, f"aspp{i}")
        params[f"aspp{i}"], stats[f"aspp{i}"] = cbr_vars(mod.atrous_conv, mod.bn)
    params["global_branch"], stats["global_branch"] = cbr_vars(
        ab.global_avg_pool[1], ab.global_avg_pool[2])
    params["project"], stats["project"] = cbr_vars(ab.conv1[0], ab.conv1[1])
    return params, stats


def aspp_hourglass_vars(hg):
    """train.py:498-518 hourglass: downsample1-4 / residual1-4 / upsample1-4
    (all full ResidualBlocks) + the ASPP bottleneck."""
    params, stats = {}, {}
    for i in range(1, 5):
        for name in ["downsample", "residual", "upsample"]:
            params[f"{name}{i}"], stats[f"{name}{i}"] = full_residual_vars(
                getattr(hg, f"{name}{i}"))
    params["aspp"], stats["aspp"] = aspp_vars(hg.aspp)
    return params, stats


def stem_vars(seq):
    """train.py:548-554 preprocess1 Sequential: [0] 7x7/2 conv, [1] ReLU,
    [2:5] ResidualBlocks."""
    params, stats = {"conv1": {"conv": t2j_conv(seq[0])}}, {}
    for i, idx in enumerate([2, 3, 4], start=1):
        params[f"residual{i}"], stats[f"residual{i}"] = full_residual_vars(seq[idx])
    return params, stats


def progressive_vars(m):
    """train.py:545-569 creatModel → ProgressiveHourglass variables.
    The reference's ``stage{i}_retuen_2`` typo maps to ``stage{i}_return_2``."""
    params, stats = {}, {}
    params["preprocess1"], stats["preprocess1"] = stem_vars(m.preprocess1)
    for i in [1, 2, 3]:
        params[f"stage{i}"], stats[f"stage{i}"] = aspp_hourglass_vars(
            getattr(m, f"stage{i}"))
        params[f"stage{i}_out"] = {"conv": t2j_conv(getattr(m, f"stage{i}_out"))}
        if i < 3:
            params[f"stage{i}_return"] = {
                "conv": t2j_conv(getattr(m, f"stage{i}_return"))}
            params[f"stage{i}_return_2"] = {
                "conv": t2j_conv(getattr(m, f"stage{i}_retuen_2"))}
            params[f"stage{i}_down_feature"] = {
                "conv": t2j_conv(getattr(m, f"stage{i}_down_feature"))}
    return {"params": params, "batch_stats": stats}


def masknet_vars(m):
    """train.py:604-622 generateMask → MaskNet variables."""
    params, stats = {}, {}
    params["preprocess1"], stats["preprocess1"] = stem_vars(m.preprocess1)
    params["stage1"], stats["stage1"] = aspp_hourglass_vars(m.stage1)
    params["stage1_out"] = {"conv": t2j_conv(m.stage1_out)}
    return {"params": params, "batch_stats": stats}


def classic_hourglass_vars(hg):
    """hourglass_compare.py:492-519 hourglass: downsample{n} =
    Sequential(MaxPool, ResidualBlock); residual5 is the bottleneck."""
    params, stats = {}, {}
    for i in range(1, 5):
        params[f"downsample{i}"], stats[f"downsample{i}"] = full_residual_vars(
            getattr(hg, f"downsample{i}")[1])
        params[f"residual{i}"], stats[f"residual{i}"] = full_residual_vars(
            getattr(hg, f"residual{i}"))
        params[f"upsample{i}"], stats[f"upsample{i}"] = full_residual_vars(
            getattr(hg, f"upsample{i}"))
    params["residual5"], stats["residual5"] = full_residual_vars(hg.residual5)
    return params, stats


def classic_vars(m, n_stack=4):
    """hourglass_compare.py:546-599 creatModel → ClassicStackedHourglass.
    preprocess1 Sequential: conv, bn, relu, res, maxpool, res, res; stage{i}
    Sequential: hourglass, residual, 1x1 conv, bn, relu."""
    params, stats = {}, {}
    params["stem_conv1"] = {"conv": t2j_conv(m.preprocess1[0])}
    p, s = t2j_bn(m.preprocess1[1])
    params["stem_bn1"], stats["stem_bn1"] = {"bn": p}, {"bn": s}
    for i, idx in enumerate([3, 5, 6], start=1):
        params[f"stem_residual{i}"], stats[f"stem_residual{i}"] = (
            full_residual_vars(m.preprocess1[idx]))
    for i in range(1, n_stack + 1):
        seq = getattr(m, f"stage{i}")
        params[f"stage{i}_hourglass"], stats[f"stage{i}_hourglass"] = (
            classic_hourglass_vars(seq[0]))
        params[f"stage{i}_residual"], stats[f"stage{i}_residual"] = (
            full_residual_vars(seq[1]))
        params[f"stage{i}_conv"] = {"conv": t2j_conv(seq[2])}
        p, s = t2j_bn(seq[3])
        params[f"stage{i}_bn"], stats[f"stage{i}_bn"] = {"bn": p}, {"bn": s}
        params[f"stage{i}_out"] = {"conv": t2j_conv(getattr(m, f"stage{i}_out"))}
        if i < n_stack:
            params[f"stage{i}_return"] = {
                "conv": t2j_conv(getattr(m, f"stage{i}_return"))}
            params[f"stage{i}_down_feature"] = {
                "conv": t2j_conv(getattr(m, f"stage{i}_down_feature"))}
    return {"params": params, "batch_stats": stats}


def rec_hourglass_vars(hg):
    """only_one_hourgless.py:168-196 hourglass: ONE shared residual_block per
    recursion level n (outermost n=depth) → flax residual_block_n{n}."""
    params, stats = {}, {}
    node = hg
    while True:
        params[f"residual_block_n{node.n}"], stats[f"residual_block_n{node.n}"] = (
            lite_residual_vars(node.residual_block))
        if node.n > 1:
            node = node.hourglass1
        else:
            break
    return params, stats


def only_one_vars(m, n_stack):
    """only_one_hourgless.py:215-229 creatModel → StackedHourglass.

    The reference creates conv3/conv4 and even APPLIES them after the final
    stack (the ``if i < nStack`` guard at line 250 is always true), but that
    last ``inter`` is discarded — dead compute with no output effect. The
    flax model materializes the return convs only when a next stack consumes
    them, so at n_stack=1 they are intentionally absent from the tree.
    """
    params, stats = {}, {}
    params["conv1"] = {"conv": t2j_conv(m.conv1)}
    for name in ["residual1", "residual2", "residual3", "residual4"]:
        params[name], stats[name] = lite_residual_vars(getattr(m, name))
    params["hourglass1"], stats["hourglass1"] = rec_hourglass_vars(m.hourglass1)
    params["lin"], stats["lin"] = cbr_vars(m.lin.conv, m.lin.bn)
    heads = ["conv2"] if n_stack == 1 else ["conv2", "conv3", "conv4"]
    for name in heads:
        params[name] = {"conv": t2j_conv(getattr(m, name))}
    return {"params": params, "batch_stats": stats}


def refiner_vars(m):
    """only_one_hourgless.py:257-268 creatModelD → RefinerD."""
    params, stats = {}, {}
    params["conv1"] = {"conv": t2j_conv(m.conv1)}
    for name in ["residual1", "residual2", "residual3", "residual4"]:
        params[name], stats[name] = lite_residual_vars(getattr(m, name))
    params["hourglass"], stats["hourglass"] = rec_hourglass_vars(m.hourglass)
    params["lin"], stats["lin"] = cbr_vars(m.lin.conv, m.lin.bn)
    params["conv2"] = {"conv": t2j_conv(m.conv2)}
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def randomize_bn_stats(module, rng):
    """Nontrivial running stats make eval-mode BN a real check."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape).astype("f")))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape).astype("f")))


def assert_trees_match(jmodel, x, got):
    ref_vars = jax.eval_shape(
        lambda: jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    for col in ["params", "batch_stats"]:
        ref_paths = {
            p for p, _ in jax.tree_util.tree_flatten_with_path(ref_vars[col])[0]}
        got_paths = {
            p for p, _ in jax.tree_util.tree_flatten_with_path(got[col])[0]}
        assert ref_paths == got_paths, (
            f"{col} missing: {sorted(map(str, ref_paths - got_paths))[:6]} "
            f"extra: {sorted(map(str, got_paths - ref_paths))[:6]}"
        )
    # Shapes must also agree for apply() to be meaningful.
    jax.tree.map(
        lambda r, g: None if r.shape == g.shape else (_ for _ in ()).throw(
            AssertionError(f"shape {g.shape} != expected {r.shape}")),
        ref_vars["params"], got["params"])


def run_torch(model, x_nhwc):
    with torch.no_grad():
        outs = model(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    if isinstance(outs, torch.Tensor):
        outs = [outs]
    return [np.transpose(o.numpy(), (0, 2, 3, 1)) for o in outs]


def assert_outputs_close(j_outs, t_outs, tol=1e-4):
    if not isinstance(j_outs, (list, tuple)):
        j_outs = [j_outs]
    assert len(j_outs) == len(t_outs)
    for i, (j_o, t_o) in enumerate(zip(j_outs, t_outs)):
        np.testing.assert_allclose(
            np.asarray(j_o), t_o, rtol=tol, atol=tol,
            err_msg=f"output {i} mismatch vs reference source")


# --------------------------------------------------------------------------
# train.py — the final progressive model family
# --------------------------------------------------------------------------


class TestTrainPySource:
    def test_progressive_creatmodel(self, rng):
        ref = load_reference("train")
        torch.manual_seed(0)
        tmodel = ref.creatModel().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)
        x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        t_outs = run_torch(tmodel, x)

        jmodel = ProgressiveHourglass(
            features=ref.nFeats,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            hourglass_depth=4,
            use_running_average=True,
            dtype=jnp.float32,
        )
        got = progressive_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_outs = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
        assert_outputs_close(j_outs, t_outs)

    def test_generatemask(self, rng):
        ref = load_reference("train")
        torch.manual_seed(1)
        tmodel = ref.generateMask().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)
        x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        t_outs = run_torch(tmodel, x)

        jmodel = MaskNet(
            features=ref.nFeats, out_channels=ref.nOutChannels_0,
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        got = masknet_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_outs = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
        assert_outputs_close(j_outs, t_outs)


# --------------------------------------------------------------------------
# hourglass_compare.py — the classic Newell baseline
# --------------------------------------------------------------------------


class TestHourglassComparePySource:
    def test_classic_creatmodel(self, rng):
        ref = load_reference("hourglass_compare")
        torch.manual_seed(2)
        tmodel = ref.creatModel().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)
        x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        t_outs = run_torch(tmodel, x)

        jmodel = ClassicStackedHourglass(
            features=ref.nFeats, n_stack=4, out_channels=16,
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        got = classic_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_outs = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
        assert_outputs_close(j_outs, t_outs)


# --------------------------------------------------------------------------
# only_one_hourgless.py — weight-shared single-stack model + refiner
# --------------------------------------------------------------------------


class TestOnlyOneHourglassSource:
    def test_single_stack_creatmodel(self, rng):
        ref = load_reference("only_one_hourgless")
        torch.manual_seed(3)
        tmodel = ref.creatModel().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)
        x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        t_outs = run_torch(tmodel, x)

        jmodel = StackedHourglass(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=ref.nOutChannels, n_modules=ref.nModules,
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        got = only_one_vars(tmodel, ref.nStack)
        assert_trees_match(jmodel, x, got)
        j_outs = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
        assert_outputs_close(j_outs, t_outs)

    def test_refiner_creatmodeld(self, rng):
        """creatModelD's forward is unrunnable as written (``ll = lin(ll)``
        at only_one_hourgless.py:280 calls the CLASS); parity is against the
        intended ``self.lin(ll)`` (cf. the Keras original, model.py:121-143),
        using the real module's own weights for every step."""
        ref = load_reference("only_one_hourgless")
        torch.manual_seed(4)
        tmodel = ref.creatModelD().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)

        def fixed_forward(m, x):
            # only_one_hourgless.py:270-282 with line 280 corrected
            x = m.relu(m.conv1(x))
            x = m.residual1(x)
            x = m.residual2(x)
            x = m.residual3(x)
            x = m.hourglass(x)
            ll = x
            for _ in range(ref.nModules):
                ll = m.residual4(ll)
            ll = m.lin(ll)
            return m.conv2(ll)

        x = rng.standard_normal(
            (2, 64, 64, ref.nOutChannels + 3)).astype(np.float32)
        with torch.no_grad():
            t_out = fixed_forward(
                tmodel, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        t_outs = [np.transpose(t_out.numpy(), (0, 2, 3, 1))]

        jmodel = RefinerD(
            features=ref.nFeats, out_channels=ref.nOutChannels,
            n_modules=ref.nModules, hourglass_depth=4,
            use_running_average=True, dtype=jnp.float32)
        got = refiner_vars(tmodel)
        assert_trees_match(jmodel, x, got)
        j_out = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
        assert_outputs_close(j_out, t_outs)

    def test_refiner_source_forward_is_broken(self, rng):
        """Pin the line-280 bug: running the reference's own forward raises
        (it constructs ``lin`` with a tensor as ``numIn``)."""
        ref = load_reference("only_one_hourgless")
        torch.manual_seed(5)
        tmodel = ref.creatModelD().eval()
        x = torch.zeros((1, ref.nOutChannels + 3, 64, 64))
        with torch.no_grad(), pytest.raises(Exception):
            tmodel(x)


# --------------------------------------------------------------------------
# try_* family — the recursive weight-shared lineages, real source
# --------------------------------------------------------------------------


def aspp_bare_vars_real(node):
    """The recursive-hourglass innermost ASPP (try_more_layer.py:258-269):
    _ASPPModule branches, global_avg_pool Sequential[1:3], BARE project
    ``conv1``."""
    params, stats = {}, {}
    for i in range(1, 5):
        mod = getattr(node, f"aspp{i}")
        params[f"aspp{i}"], stats[f"aspp{i}"] = cbr_vars(mod.atrous_conv, mod.bn)
    params["global_branch"], stats["global_branch"] = cbr_vars(
        node.global_avg_pool[1], node.global_avg_pool[2])
    params["project"] = {"conv": t2j_conv(node.conv1)}
    return params, stats


def rec_hourglass_vars_aspp(hg, aspp):
    """Recursive weight-shared hourglass with per-level shared residual_block.

    ``aspp``: 'used' transfers the innermost level's ASPP (try_more_layer
    forward, lines 281-290); 'unused' skips the ASPP members the reference
    constructs at EVERY level but never calls (try_with_aspp.py:263-279,
    try_different_stack.py — dead parameters with no output effect).
    """
    params, stats = {}, {}
    node = hg
    while True:
        params[f"residual_block_n{node.n}"], stats[f"residual_block_n{node.n}"] = (
            lite_residual_vars(node.residual_block))
        if node.n > 1:
            node = node.hourglass1
        else:
            if aspp == "used":
                params["aspp"], stats["aspp"] = aspp_bare_vars_real(node)
            break
    return params, stats


def plain_stack_vars(m, heads, hourglass=None):
    """Shared transfer for the conv1/residual1-4/hourglass1/lin/conv* models
    (try_with_torch.py:264-278 and kin)."""
    params, stats = {}, {}
    params["conv1"] = {"conv": t2j_conv(m.conv1)}
    for name in ["residual1", "residual2", "residual3", "residual4"]:
        params[name], stats[name] = lite_residual_vars(getattr(m, name))
    params["hourglass1"], stats["hourglass1"] = (
        hourglass if hourglass is not None else rec_hourglass_vars(m.hourglass1))
    params["lin"], stats["lin"] = cbr_vars(m.lin.conv, m.lin.bn)
    for name in heads:
        params[name] = {"conv": t2j_conv(getattr(m, name))}
    return {"params": params, "batch_stats": stats}


def catmerge_hourglass_vars_real(hg, prefix=""):
    """Cat-merge stride hourglass (try_costomer_loss.py:227-263): per level
    residual_block_stride (down) + residual_block (post-recursion) + conv2
    (cat-merge 1x1). The maxpool/aspp*/global_avg_pool/conv1/conv3 members
    are constructed but never called in forward — skipped."""
    params, stats = {}, {}
    params[f"{prefix}residual_stride"], stats[f"{prefix}residual_stride"] = (
        full_residual_vars(hg.residual_block_stride))
    params[f"{prefix}residual"], stats[f"{prefix}residual"] = (
        full_residual_vars(hg.residual_block))
    params[f"{prefix}conv2"] = {"conv": t2j_conv(hg.conv2)}
    if hg.n > 1:
        p, s = catmerge_hourglass_vars_real(hg.hourglass1, f"{prefix}inner_")
        params.update(p)
        stats.update(s)
    return params, stats


def catmerge_vars_real(m):
    """try_costomer_loss.py:282-297 / try_with_aspp_remove_max_pool.py:260-275
    creatModel → GatedRecursiveProgressive."""
    params, stats = {}, {}
    stem_p = {"conv1": {"conv": t2j_conv(m.conv1)}}
    stem_s = {}
    for name in ["residual1", "residual2", "residual3"]:
        stem_p[name], stem_s[name] = full_residual_vars(getattr(m, name))
    params["preprocess1"], stats["preprocess1"] = stem_p, stem_s
    params["hourglass1"], stats["hourglass1"] = catmerge_hourglass_vars_real(
        m.hourglass1)
    params["residual4"], stats["residual4"] = full_residual_vars(m.residual4)
    params["lin"], stats["lin"] = cbr_vars(m.lin.conv, m.lin.bn)
    for name in ["conv2_0", "conv4_0", "conv2_1", "conv4_1", "conv2_2"]:
        params[name] = {"conv": t2j_conv(getattr(m, name))}
    return {"params": params, "batch_stats": stats}


def rec_progressive_vars_real(m, aspp):
    """try_more_layer.py:315-331 / try_with_aspp.py:298-314 /
    try_different_stack.py:282-298 creatModel → ProgressiveRecursiveASPP."""
    params, stats = {}, {}
    params["conv1"] = {"conv": t2j_conv(m.conv1)}
    for name in ["residual1", "residual2", "residual3", "residual4"]:
        params[name], stats[name] = lite_residual_vars(getattr(m, name))
    params["hourglass1"], stats["hourglass1"] = rec_hourglass_vars_aspp(
        m.hourglass1, aspp)
    params["lin"], stats["lin"] = cbr_vars(m.lin.conv, m.lin.bn)
    for name in ["conv2_0", "conv4_0", "conv2_1", "conv4_1", "conv2_2"]:
        params[name] = {"conv": t2j_conv(getattr(m, name))}
    return {"params": params, "batch_stats": stats}


def stage_sequential_vars_real(m):
    """try_remove_background_and_costomer_loss.py:311-337 creatModel →
    StageSequentialProgressive."""
    params, stats = {}, {}
    params["preprocess1"], stats["preprocess1"] = stem_vars(m.preprocess1)
    for i in [1, 2, 3]:
        seq = getattr(m, f"stage{i}")
        params[f"stage{i}"], stats[f"stage{i}"] = catmerge_hourglass_vars_real(
            seq[0])
        params[f"stage{i}_residual"], stats[f"stage{i}_residual"] = (
            full_residual_vars(seq[1]))
        params[f"stage{i}_out"] = {"conv": t2j_conv(getattr(m, f"stage{i}_out"))}
    params["stage2_return"] = {"conv": t2j_conv(m.stage2_return)}
    return {"params": params, "batch_stats": stats}


def _run_case(rng, ref, jmodel, got, seed_shape=(1, 128, 128, 3), tol=1e-4):
    x = rng.standard_normal(seed_shape).astype(np.float32)
    t_outs = run_torch(ref, x)
    assert_trees_match(jmodel, x, got)
    j_outs = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
    assert_outputs_close(j_outs, t_outs, tol)


class TestTryFamilySource:
    """One real-source parity test per distinct try_* architecture family
    (the copy-evolved siblings — try_with_torch_100, try_spilt_part,
    try_skeleton, try_remove_background — define byte-identical model
    classes and are covered by their family's test)."""

    def _prep(self, script, seed, rng):
        ref = load_reference(script)
        torch.manual_seed(seed)
        tmodel = ref.creatModel().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)
        return ref, tmodel

    def test_try_with_torch_plain_4stack(self, rng):
        ref, tmodel = self._prep("try_with_torch", 10, rng)
        jmodel = StackedHourglass(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=ref.nOutChannels, n_modules=ref.nModules,
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  plain_stack_vars(tmodel, ["conv2", "conv3", "conv4"]))

    def test_try_skeleton_and_keypoints_merge(self, rng):
        ref, tmodel = self._prep("try_skeleton_and_keypoints", 11, rng)
        jmodel = StackedHourglass(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=ref.nOutChannels, n_modules=ref.nModules,
            variant="skeleton_merge", skeleton=np.asarray(ref.sks),
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  plain_stack_vars(tmodel, ["conv2", "conv3", "conv4"]))

    def test_try_skeleton_from_keypoints(self, rng):
        ref, tmodel = self._prep("try_skeleton_from_keypoints", 12, rng)
        jmodel = StackedHourglass(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=ref.nOutChannels, n_modules=ref.nModules,
            variant="skeleton_from_keypoints", skeleton=np.asarray(ref.sks),
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  plain_stack_vars(tmodel, ["conv2", "conv3", "conv4"]))

    def test_try_skeleton_from_keypoints_merge(self, rng):
        ref, tmodel = self._prep("try_skeleton_from_keypoints_merge", 13, rng)
        jmodel = StackedHourglass(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=ref.nOutChannels, n_modules=ref.nModules,
            variant="skeleton_from_keypoints_merge",
            skeleton=np.asarray(ref.sks),
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  plain_stack_vars(tmodel, ["conv2", "conv3", "conv4"]))

    def test_try_more_layer_aspp_bottleneck(self, rng):
        ref, tmodel = self._prep("try_more_layer", 14, rng)
        jmodel = ProgressiveRecursiveASPP(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            n_modules=ref.nModules, hourglass_depth=4, bottleneck="aspp",
            use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  rec_progressive_vars_real(tmodel, aspp="used"))

    def test_try_with_aspp_identity_bottleneck(self, rng):
        ref, tmodel = self._prep("try_with_aspp", 15, rng)
        jmodel = ProgressiveRecursiveASPP(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            n_modules=ref.nModules, hourglass_depth=4, bottleneck="identity",
            use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  rec_progressive_vars_real(tmodel, aspp="unused"))

    def test_try_different_stack_modules_bottleneck(self, rng):
        ref, tmodel = self._prep("try_different_stack", 16, rng)
        jmodel = ProgressiveRecursiveASPP(
            features=ref.nFeats, n_stack=ref.nStack,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            n_modules=ref.nModules, hourglass_depth=4, bottleneck="modules",
            use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  rec_progressive_vars_real(tmodel, aspp="unused"))

    def test_try_different_stack_without_skeleton_two_stack(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            TwoStackProgressive,
        )

        ref, tmodel = self._prep("try_different_stack_without_skeleton", 17, rng)
        jmodel = TwoStackProgressive(
            features=ref.nFeats,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1),
            n_modules=ref.nModules, hourglass_depth=4,
            use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel,
                  plain_stack_vars(tmodel, ["conv2_0", "conv4_0", "conv2_1"]))

    def test_try_costomer_loss_gated(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            GatedRecursiveProgressive,
        )

        ref, tmodel = self._prep("try_costomer_loss", 18, rng)
        jmodel = GatedRecursiveProgressive(
            features=ref.nFeats,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            gate_stage0=True, hourglass_depth=4,
            use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel, catmerge_vars_real(tmodel))

    def test_try_with_aspp_remove_max_pool_ungated(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            GatedRecursiveProgressive,
        )

        ref, tmodel = self._prep("try_with_aspp_remove_max_pool", 19, rng)
        jmodel = GatedRecursiveProgressive(
            features=ref.nFeats,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            gate_stage0=False, hourglass_depth=4,
            use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel, catmerge_vars_real(tmodel))

    def test_try_remove_background_stage_sequential(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.models import (
            StageSequentialProgressive,
        )

        ref, tmodel = self._prep("try_remove_background_and_costomer_loss", 20, rng)
        jmodel = StageSequentialProgressive(
            features=ref.nFeats,
            out_channels=(ref.nOutChannels_0, ref.nOutChannels_1,
                          ref.nOutChannels_2),
            hourglass_depth=4, use_running_average=True, dtype=jnp.float32)
        _run_case(rng, tmodel, jmodel, stage_sequential_vars_real(tmodel))
