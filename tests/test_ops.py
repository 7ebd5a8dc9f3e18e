"""Unit tests for resize/pool ops (torch-parity) and conv blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from progressive_process_for_human_pose_estimation_tpu.ops import (
    ASPPBlock,
    ConvBNReLU,
    ResidualBlock,
    ResidualBlockLite,
    global_avg_pool,
    max_pool_2x2,
    resize_bilinear_align_corners,
    upsample2x_bilinear_align_corners,
    upsample2x_nearest,
)


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


class TestResizeTorchParity:
    def test_upsample2x_nearest(self, rng):
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
        theirs = nhwc(F.interpolate(torch.from_numpy(nchw(x)), scale_factor=2).numpy())
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)

    @pytest.mark.parametrize("out_size", [(16, 16), (7, 13), (1, 1), (8, 8)])
    def test_bilinear_align_corners(self, rng, out_size):
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        ours = np.asarray(
            resize_bilinear_align_corners(jnp.asarray(x), out_size[0], out_size[1])
        )
        theirs = nhwc(
            F.interpolate(
                torch.from_numpy(nchw(x)), size=out_size, mode="bilinear", align_corners=True
            ).numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_bilinear_from_1x1_broadcast(self, rng):
        x = rng.standard_normal((2, 1, 1, 5)).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 16, 16))
        theirs = nhwc(
            F.interpolate(
                torch.from_numpy(nchw(x)), size=(16, 16), mode="bilinear", align_corners=True
            ).numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    def test_upsample2x_bilinear_align_corners(self, rng):
        x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        ours = np.asarray(upsample2x_bilinear_align_corners(jnp.asarray(x)))
        theirs = nhwc(
            F.interpolate(
                torch.from_numpy(nchw(x)), scale_factor=2, mode="bilinear", align_corners=True
            ).numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_max_pool_2x2(self, rng):
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        ours = np.asarray(max_pool_2x2(jnp.asarray(x)))
        theirs = nhwc(F.max_pool2d(torch.from_numpy(nchw(x)), 2, 2).numpy())
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)

    def test_global_avg_pool(self, rng):
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        ours = np.asarray(global_avg_pool(jnp.asarray(x)))
        theirs = nhwc(F.adaptive_avg_pool2d(torch.from_numpy(nchw(x)), (1, 1)).numpy())
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


class TestBlocks:
    def _init_apply(self, module, x):
        variables = module.init(jax.random.PRNGKey(0), x)
        y, updates = module.apply(x=x, variables=variables, mutable=["batch_stats"])
        return y, variables, updates

    def test_residual_block_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
        m = ResidualBlock(features=16, stride=2)
        variables = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(variables, x, mutable=["batch_stats"])
        assert y.shape == (2, 8, 8, 16)

    def test_residual_block_identity_skip_when_not_always_project(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
        m = ResidualBlock(features=16, always_project=False)
        variables = m.init(jax.random.PRNGKey(0), x)
        assert "down_conv" not in variables["params"]
        m2 = ResidualBlock(features=16, always_project=True)
        variables2 = m2.init(jax.random.PRNGKey(0), x)
        assert "down_conv" in variables2["params"]

    def test_residual_lite_projection_only_on_channel_change(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
        same = ResidualBlockLite(features=16)
        assert "conv4" not in same.init(jax.random.PRNGKey(0), x)["params"]
        grow = ResidualBlockLite(features=32)
        assert "conv4" in grow.init(jax.random.PRNGKey(0), x)["params"]

    def test_aspp_block(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 256)).astype(np.float32))
        m = ASPPBlock()
        variables = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(variables, x, mutable=["batch_stats"])
        assert y.shape == (1, 16, 16, 256)

    def test_conv_bn_relu_nonnegative(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        m = ConvBNReLU(features=8)
        variables = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(variables, x, mutable=["batch_stats"])
        assert float(jnp.min(y)) >= 0.0


class TestBatchNormTorchBookkeeping:
    """ops.BatchNorm must match torch BatchNorm2d EXACTLY, including the
    running-stat rule torch uses and flax does not: normalize with the
    BIASED batch variance but EMA the UNBIASED one (Bessel n/(n-1)).
    The reference trains and (train.py:991) evaluates through torch BN, so
    running-average eval parity depends on this bookkeeping."""

    def test_train_forward_and_running_stats(self, rng):
        from progressive_process_for_human_pose_estimation_tpu.ops.blocks import (
            BatchNorm,
        )

        x = rng.standard_normal((4, 8, 8, 16)).astype(np.float32)
        bn = BatchNorm(use_running_average=False)
        v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        v = {
            "params": {"bn": dict(v["params"]["bn"])},
            "batch_stats": {"bn": dict(v["batch_stats"]["bn"])},
        }
        v["params"]["bn"]["scale"] = jnp.asarray(
            rng.uniform(0.5, 2, 16).astype("f"))
        v["params"]["bn"]["bias"] = jnp.asarray(
            rng.normal(0, 0.3, 16).astype("f"))
        v["batch_stats"]["bn"]["mean"] = jnp.asarray(
            rng.normal(0, 0.3, 16).astype("f"))
        v["batch_stats"]["bn"]["var"] = jnp.asarray(
            rng.uniform(0.5, 2, 16).astype("f"))

        tbn = torch.nn.BatchNorm2d(16)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(np.asarray(v["params"]["bn"]["scale"])))
            tbn.bias.copy_(torch.from_numpy(np.asarray(v["params"]["bn"]["bias"])))
            tbn.running_mean.copy_(
                torch.from_numpy(np.asarray(v["batch_stats"]["bn"]["mean"])))
            tbn.running_var.copy_(
                torch.from_numpy(np.asarray(v["batch_stats"]["bn"]["var"])))

        y, upd = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])
        tbn.train()
        ty = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y), ty.detach().numpy().transpose(0, 2, 3, 1),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["bn"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-6, atol=1e-7)
        # The decisive check: torch EMAs the UNBIASED variance.
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["bn"]["var"]),
            tbn.running_var.numpy(), rtol=1e-6, atol=1e-7)

        # Eval mode consumes the running stats identically.
        ye = BatchNorm(use_running_average=True).apply(v, jnp.asarray(x))
        tbn.eval()
        with torch.no_grad():
            tbn.running_mean.copy_(
                torch.from_numpy(np.asarray(v["batch_stats"]["bn"]["mean"])))
            tbn.running_var.copy_(
                torch.from_numpy(np.asarray(v["batch_stats"]["bn"]["var"])))
            tye = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(ye), tye.numpy().transpose(0, 2, 3, 1),
            rtol=2e-5, atol=2e-5)
