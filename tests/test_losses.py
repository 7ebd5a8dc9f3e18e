"""Loss-family parity tests against torch implementations of the reference
semantics (/root/reference/train.py:343-408). Torch tensors are NCHW, ours
NHWC; tests transpose at the boundary."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from progressive_process_for_human_pose_estimation_tpu.losses import (
    ce_loss,
    combined_ohem_ce_loss,
    masked_ce_loss,
    masked_mse_loss,
    mse_loss,
    ohem_ce_loss,
    ohem_mse_loss,
    split_channel_ce_loss,
)


def make_cls_case(rng, n=3, c=5, h=8, w=8):
    logits = rng.standard_normal((n, h, w, c)).astype(np.float32)
    target = rng.integers(0, c, (n, h, w)).astype(np.int64)
    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    t_target = torch.from_numpy(target)
    return logits, target, t_logits, t_target


def torch_ohem_ce(t_logits, t_target, fraction, floor):
    # Reference semantics (/root/reference/train.py:350-362).
    if fraction < floor:
        fraction = floor
    loss = F.nll_loss(F.log_softmax(t_logits, dim=1), t_target, reduction="none")
    k = int(t_logits.shape[2] * t_logits.shape[3] * fraction)
    loss, _ = torch.topk(loss.view(t_logits.shape[0], -1), k)
    return loss.mean().item()


def torch_ohem_mse(t_pred, t_target, fraction, floor):
    # Reference semantics (/root/reference/train.py:401-408); note the k from
    # H*W but pool of C*H*W quirk.
    if fraction < floor:
        fraction = floor
    loss = F.mse_loss(t_pred, t_target, reduction="none")
    k = int(t_pred.shape[2] * t_pred.shape[3] * fraction)
    # reshape (not view): our NHWC→NCHW transpose makes the tensor
    # non-contiguous; values are identical to the reference's view().
    loss, _ = torch.topk(loss.reshape(t_pred.shape[0], -1), k)
    return loss.mean().item()


class TestCrossEntropy:
    def test_plain_ce(self, rng):
        logits, target, tl, tt = make_cls_case(rng)
        theirs = F.cross_entropy(tl, tt).item()
        ours = float(ce_loss(jnp.asarray(logits), jnp.asarray(target)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_ohem_ce_fractions(self, rng):
        logits, target, tl, tt = make_cls_case(rng)
        for fraction in [1.0, 0.73, 0.5, 0.25, 0.05]:
            theirs = torch_ohem_ce(tl, tt, fraction, floor=0.1)
            ours = float(ohem_ce_loss(jnp.asarray(logits), jnp.asarray(target), fraction))
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, err_msg=f"fraction={fraction}")

    def test_ohem_ce_floor_clamps(self, rng):
        logits, target, tl, tt = make_cls_case(rng)
        theirs = torch_ohem_ce(tl, tt, 0.25, floor=0.25)
        ours = float(
            ohem_ce_loss(jnp.asarray(logits), jnp.asarray(target), 0.01, floor=0.25)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_combined(self, rng):
        logits, target, tl, tt = make_cls_case(rng)
        theirs = torch_ohem_ce(tl, tt, 0.6, 0.1) + F.cross_entropy(tl, tt).item()
        ours = float(combined_ohem_ce_loss(jnp.asarray(logits), jnp.asarray(target), 0.6))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_masked_ce(self, rng):
        logits, target, tl, tt = make_cls_case(rng)
        mask = rng.integers(0, 2, target.shape).astype(np.float32)
        theirs = (
            (F.nll_loss(F.log_softmax(tl, dim=1), tt, reduction="none") * torch.from_numpy(mask))
            .mean()
            .item()
        )
        ours = float(
            masked_ce_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(mask))
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_split_channel(self, rng):
        n, h, w = 2, 8, 8
        logits = rng.standard_normal((n, h, w, 38)).astype(np.float32)
        kp = rng.integers(0, 18, (n, h, w)).astype(np.int64)
        sk = rng.integers(0, 20, (n, h, w)).astype(np.int64)
        tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
        theirs = (
            F.cross_entropy(tl[:, :18], torch.from_numpy(kp))
            + F.cross_entropy(tl[:, 18:], torch.from_numpy(sk))
        ).item()
        ours = float(
            split_channel_ce_loss(
                jnp.asarray(logits), jnp.asarray(kp), jnp.asarray(sk), split=18
            )
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


class TestMSE:
    def test_plain_mse(self, rng):
        pred = rng.standard_normal((2, 8, 8, 17)).astype(np.float32)
        target = rng.standard_normal((2, 8, 8, 17)).astype(np.float32)
        theirs = F.mse_loss(torch.from_numpy(pred), torch.from_numpy(target)).item()
        ours = float(mse_loss(jnp.asarray(pred), jnp.asarray(target)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_ohem_mse(self, rng):
        pred = rng.standard_normal((2, 8, 8, 17)).astype(np.float32)
        target = rng.standard_normal((2, 8, 8, 17)).astype(np.float32)
        tp = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
        tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2)))
        for fraction in [1.0, 0.5, 0.3]:
            theirs = torch_ohem_mse(tp, tt, fraction, floor=0.25)
            ours = float(ohem_mse_loss(jnp.asarray(pred), jnp.asarray(target), fraction))
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, err_msg=f"fraction={fraction}")

    def test_masked_mse(self, rng):
        pred = rng.standard_normal((2, 8, 8, 17)).astype(np.float32)
        target = rng.standard_normal((2, 8, 8, 17)).astype(np.float32)
        mask = rng.integers(0, 2, (2, 8, 8)).astype(np.float32)
        tm = torch.from_numpy(mask).view(2, 1, 8, 8)
        tp = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
        tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2)))
        theirs = (F.mse_loss(tp, tt, reduction="none") * tm).mean().item()
        ours = float(
            masked_mse_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_ohem_under_jit_with_traced_fraction(self, rng):
        import jax

        logits = jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype(np.float32))
        target = jnp.asarray(rng.integers(0, 5, (2, 8, 8)))

        @jax.jit
        def f(fraction):
            return ohem_ce_loss(logits, target, fraction)

        # Changing the annealed fraction must not recompile (traced scalar).
        a = float(f(0.9))
        b = float(f(0.3))
        assert a != b
