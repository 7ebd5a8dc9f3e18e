"""Twin-training equivalence: the reference's ACTUAL train.py model + losses
(torch, CPU, fp32) vs this framework (JAX, CPU, fp32), from ONE shared init
and ONE fixed batch stream (VERDICT round 3, item 2).

This exercises, end to end, everything the per-forward parity tests cannot:
Adam update semantics (lr 1e-4, eps 1e-4, /root/reference/train.py:834),
BatchNorm train-mode statistics + torch-rule running-stat EMA bookkeeping,
the annealed-OHEM + plain CE objective on the skeleton and keypoint stages
(/root/reference/train.py:887-890 — the stage-1 background loss is commented
out there and therefore absent here too), and gradient flow through the full
3-stage progressive model (train.py:545-601).

Shared by:
- tests/test_twin_training.py — tiny CI configuration (few steps, asserted
  tolerance);
- ``python tests/twin_harness.py --steps 200 ...`` — the long run whose
  curves are committed under runs_r4/ (see ROUND4_NOTES.md).

Both sides must run on CPU: XLA:TPU fp32 convolutions are not IEEE-faithful
by default, and the comparison target (torch) runs on CPU here.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


MPII_SKS = None  # filled from the reference module (train.py:75-91)


def _reference():
    from reference_source import load_reference

    return load_reference("train")


def make_stream(n_batches: int, batch_size: int, inputsize: int, seed: int,
                render_gauss: bool = False):
    """Fixed MPII-schema batches rendered by the framework's own device
    renderer (data/pipeline.make_mpii_batch_fn — ellipse keypoints, line
    skeletons, head rects in map space), dumped to numpy so both twins
    consume byte-identical data.  ``render_gauss`` additionally renders the
    classic baseline's 16-ch unnormalized σ=1 Gaussian targets
    (/root/reference/hourglass_compare.py:713-737) for the classic twin."""
    import jax.numpy as jnp

    from progressive_process_for_human_pose_estimation_tpu.data.pipeline import (
        make_mpii_batch_fn,
    )

    ref = _reference()
    sks = np.asarray(ref.sks)  # MPII 15-edge skeleton
    n_joints = ref.nKeypoint_MPII
    render = make_mpii_batch_fn(
        skeleton=sks, inputsize=inputsize, render_gauss=render_gauss
    )

    rng = np.random.default_rng(seed)
    stream = []
    for _ in range(n_batches):
        images = rng.random((batch_size, inputsize, inputsize, 3)).astype(np.float32)
        # Keypoints in source-pixel coords; src == inputsize so resize is
        # identity and labels land at exact /4-map positions like the MPII
        # path (/root/reference/train.py:668-686).
        kps = np.zeros((batch_size, n_joints, 3), np.float32)
        kps[..., 0] = rng.uniform(2, inputsize - 2, (batch_size, n_joints))
        kps[..., 1] = rng.uniform(2, inputsize - 2, (batch_size, n_joints))
        kps[..., 2] = (rng.random((batch_size, n_joints)) > 0.1).astype(np.float32)
        # Plausible head rect in source pixels (scaled to map space by the
        # renderer, train.py:692-694).
        cx = rng.uniform(0.3, 0.7, batch_size) * inputsize
        cy = rng.uniform(0.2, 0.5, batch_size) * inputsize
        half = rng.uniform(0.05, 0.12, batch_size) * inputsize
        rects = np.stack([cx - half, cy - half, cx + half, cy + half], 1).astype(
            np.float32
        )
        src = np.full((batch_size, 2), inputsize, np.int32)
        b = render(
            jnp.asarray(images), jnp.asarray(kps), jnp.asarray(rects), jnp.asarray(src)
        )
        out = {
            "image": np.asarray(b["image"], np.float32),
            "keypoint_map": np.asarray(b["keypoint_map"], np.int32),
            "skeleton_map": np.asarray(b["skeleton_map"], np.int32),
            "head_rect": np.asarray(b["head_rect"], np.float32),
        }
        if render_gauss:
            out["gauss_maps"] = np.asarray(b["gauss_maps"], np.float32)
        stream.append(out)
    return stream


def shared_init(seed: int):
    """Instantiate the reference creatModel (torch init) and transfer its
    weights to the flax tree — the single shared initialization."""
    import torch

    from test_parity_reference import progressive_vars

    ref = _reference()
    torch.manual_seed(seed)
    tmodel = ref.creatModel()
    variables = progressive_vars(tmodel)
    return ref, tmodel, variables


def run_torch_twin(ref, tmodel, stream, steps: int, steps_per_epoch: int,
                   dtype=None):
    """The reference's own training loop semantics (train.py:874-899, minus
    apex AMP — both twins run fp32), using the reference's OWN loss classes.

    ``dtype=torch.float64`` runs the CONTROL twin: same implementation at
    higher precision. Train-mode batch-stat BN at small feature maps divides
    by tiny, noisily-estimated sigmas, so the fp32 forward is chaotically
    ill-conditioned — measured on this config, torch-fp32 diverges from
    torch-fp64 by O(1) on raw logits within one forward. The JAX twin is
    therefore judged against the fp32-vs-fp64 gap (the intrinsic fp32
    noise), not against zero."""
    import torch
    import torch.nn as tnn

    if dtype is not None:
        tmodel = tmodel.to(dtype)
    cast = (lambda t: t.to(dtype)) if dtype is not None else (lambda t: t)
    opt = torch.optim.Adam(tmodel.parameters(), lr=ref.learning_rate, eps=1e-4)
    ohem_sk = ref.Costomer_CrossEntropyLoss()
    ohem_kp = ref.Costomer_CrossEntropyLoss()
    plain_sk = tnn.CrossEntropyLoss()
    plain_kp = tnn.CrossEntropyLoss()
    tmodel.train()

    losses = []
    for step in range(steps):
        b = stream[step % len(stream)]
        epoch = step // steps_per_epoch
        x = cast(torch.from_numpy(
            np.ascontiguousarray(b["image"].transpose(0, 3, 1, 2))))
        sk_t = torch.from_numpy(b["skeleton_map"]).long()
        kp_t = torch.from_numpy(b["keypoint_map"]).long()
        result = tmodel(x)
        loss_2 = ohem_sk.forward(result[1], sk_t, (100 - epoch) / 100) + plain_sk(
            result[1], sk_t
        )
        loss_3 = ohem_kp.forward(result[2], kp_t, (100 - epoch) / 100) + plain_kp(
            result[2], kp_t
        )
        total = loss_2 + loss_3
        opt.zero_grad()
        total.backward()
        opt.step()
        losses.append(float(total.detach()))
    return losses


def run_jax_twin(ref, variables, stream, steps: int, steps_per_epoch: int):
    """The framework's production path: ProgressiveHourglass +
    progressive_objective through train.loop.make_train_step."""
    import jax.numpy as jnp

    from progressive_process_for_human_pose_estimation_tpu.models import (
        ProgressiveHourglass,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.loop import (
        make_train_step,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
        progressive_objective,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.state import (
        TrainState,
        make_optimizer,
    )

    model = ProgressiveHourglass(
        features=ref.nFeats,
        out_channels=(ref.nOutChannels_0, ref.nOutChannels_1, ref.nOutChannels_2),
        hourglass_depth=4,
        dtype=jnp.float32,
    )
    tx = make_optimizer(ref.learning_rate, eps=1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    step_fn = make_train_step(model, progressive_objective, donate=False)

    losses = []
    for step in range(steps):
        b = stream[step % len(stream)]
        state = state.replace(epoch=jnp.asarray(step // steps_per_epoch, jnp.int32))
        batch = {
            "image": jnp.asarray(b["image"]),
            "skeleton_map": jnp.asarray(b["skeleton_map"]),
            "keypoint_map": jnp.asarray(b["keypoint_map"]),
        }
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, state


def eval_twins(ref, tmodel, state, stream):
    """Final equivalence: .eval()-mode (running-stat BN — the faithful mode
    for train.py's model) stage-3 softmax heatmaps + PCKh curves on the
    stream. Running stats were accumulated independently by each twin, so a
    heatmap match here proves the BN bookkeeping tracked, not just params."""
    import jax
    import jax.numpy as jnp
    import torch

    from progressive_process_for_human_pose_estimation_tpu.eval.pckh import pckh_curve
    from progressive_process_for_human_pose_estimation_tpu.models import (
        ProgressiveHourglass,
    )

    eval_model = ProgressiveHourglass(
        features=ref.nFeats,
        out_channels=(ref.nOutChannels_0, ref.nOutChannels_1, ref.nOutChannels_2),
        hourglass_depth=4,
        use_running_average=True,
        dtype=jnp.float32,
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply = jax.jit(lambda v, x: eval_model.apply(v, x))

    tmodel.eval()
    t_hm, j_hm, t_acc, j_acc = [], [], [], []
    for b in stream:
        xt = torch.from_numpy(
            np.ascontiguousarray(b["image"].transpose(0, 3, 1, 2)))
        p = next(tmodel.parameters())
        with torch.no_grad():
            t_out = tmodel(xt.to(p.dtype))[2].float()
        t_soft = torch.softmax(t_out, dim=1).numpy().transpose(0, 2, 3, 1)
        j_out = apply(variables, jnp.asarray(b["image"]))[2]
        j_soft = np.asarray(jax.nn.softmax(j_out, axis=-1))
        t_hm.append(t_soft)
        j_hm.append(j_soft)
        rect = jnp.asarray(b["head_rect"])
        tgt = jnp.asarray(b["keypoint_map"])
        t_acc.append(np.asarray(pckh_curve(jnp.asarray(t_soft), tgt, rect).accuracy))
        j_acc.append(np.asarray(pckh_curve(jnp.asarray(j_soft), tgt, rect).accuracy))
    t_hm, j_hm = np.concatenate(t_hm), np.concatenate(j_hm)
    t_curve = np.nanmean(np.concatenate(t_acc), axis=0)
    j_curve = np.nanmean(np.concatenate(j_acc), axis=0)
    return {
        "heatmap_max_abs": float(np.max(np.abs(t_hm - j_hm))),
        "torch_heatmaps": t_hm,
        "jax_heatmaps": j_hm,
        "torch_pckh": t_curve,
        "jax_pckh": j_curve,
    }


def _reference_classic():
    from reference_source import load_reference

    return load_reference("hourglass_compare")


def shared_init_classic(seed: int):
    """The classic Newell baseline's ACTUAL creatModel
    (/root/reference/hourglass_compare.py:546-638), torch-initialized and
    weight-transferred to the flax tree."""
    import torch

    from test_parity_reference import classic_vars

    ref = _reference_classic()
    torch.manual_seed(seed)
    tmodel = ref.creatModel()
    return ref, tmodel, classic_vars(tmodel)


def run_torch_twin_classic(ref, tmodel, stream, steps: int, dtype=None):
    """The classic baseline's training semantics: Adam(1e-4, eps=1e-4)
    (/root/reference/hourglass_compare.py:885) + per-stack nn.MSELoss
    (hourglass_compare.py:853-856, 936-941).

    Targets: the 16-ch Gaussian maps — the RUNNABLE INTENT of the
    reference's loop. As written, neither of its dataset branches can
    actually feed that loop: the COCO dataset returns 17-ch Gauss maps
    (hourglass_compare.py:286) against the model's 16-ch heads
    (hourglass_compare.py:566), and the MPII dataset returns the INTEGER
    ellipse label map as y_keypoints (hourglass_compare.py:763-765), which
    MSELoss rejects (Long target) — both raise; pinned by
    tests/test_twin_training.py::test_classic_train_branch_unrunnable. The
    framework's classic_mse_objective implements the intent on the MPII
    Gauss maps the same dataset constructs (hourglass_compare.py:713-737)
    and then drops on the floor."""
    import torch
    import torch.nn as tnn

    if dtype is not None:
        tmodel = tmodel.to(dtype)
    cast = (lambda t: t.to(dtype)) if dtype is not None else (lambda t: t)
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-4, eps=1e-4)
    mse = [tnn.MSELoss() for _ in range(4)]
    tmodel.train()

    losses = []
    for step in range(steps):
        b = stream[step % len(stream)]
        x = cast(torch.from_numpy(
            np.ascontiguousarray(b["image"].transpose(0, 3, 1, 2))))
        y = cast(torch.from_numpy(
            np.ascontiguousarray(b["gauss_maps"].transpose(0, 3, 1, 2))))
        result = tmodel(x)
        total = sum(m(result[i], y) for i, m in enumerate(mse))
        opt.zero_grad()
        total.backward()
        opt.step()
        losses.append(float(total.detach()))
    return losses


def run_jax_twin_classic(ref, variables, stream, steps: int):
    """The framework's production classic path: ClassicStackedHourglass +
    classic_mse_objective through train.loop.make_train_step (the
    classic_baseline experiment preset's exact wiring)."""
    import jax.numpy as jnp

    from progressive_process_for_human_pose_estimation_tpu.models import (
        ClassicStackedHourglass,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.loop import (
        make_train_step,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.objectives import (
        classic_mse_objective,
    )
    from progressive_process_for_human_pose_estimation_tpu.train.state import (
        TrainState,
        make_optimizer,
    )

    model = ClassicStackedHourglass(
        features=ref.nFeats, n_stack=4, out_channels=16, hourglass_depth=4,
        dtype=jnp.float32,
    )
    tx = make_optimizer(1e-4, eps=1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    step_fn = make_train_step(model, classic_mse_objective, donate=False)

    losses = []
    for step in range(steps):
        b = stream[step % len(stream)]
        batch = {
            "image": jnp.asarray(b["image"]),
            "gauss_maps": jnp.asarray(b["gauss_maps"]),
        }
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, state


def eval_twins_classic(ref, tmodel, state, stream):
    """Final equivalence for the classic pair: .eval()-mode (running-stat
    BN — hourglass_compare.py:1043 calls .eval()) softmaxed STACK-2 output
    — the stack performance_compare.py:647 actually scores — plus the
    PCKh_hourglass curve (no background-channel offset,
    performance_compare.py:581-615)."""
    import jax
    import jax.numpy as jnp
    import torch

    from progressive_process_for_human_pose_estimation_tpu.eval.pckh import pckh_curve
    from progressive_process_for_human_pose_estimation_tpu.models import (
        ClassicStackedHourglass,
    )

    eval_model = ClassicStackedHourglass(
        features=ref.nFeats, n_stack=4, out_channels=16, hourglass_depth=4,
        use_running_average=True, dtype=jnp.float32,
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply = jax.jit(lambda v, x: eval_model.apply(v, x))

    tmodel.eval()
    t_hm, j_hm, t_acc, j_acc = [], [], [], []
    for b in stream:
        xt = torch.from_numpy(
            np.ascontiguousarray(b["image"].transpose(0, 3, 1, 2)))
        p = next(tmodel.parameters())
        with torch.no_grad():
            t_out = tmodel(xt.to(p.dtype))[2].float()
        t_soft = torch.softmax(t_out, dim=1).numpy().transpose(0, 2, 3, 1)
        j_out = apply(variables, jnp.asarray(b["image"]))[2]
        j_soft = np.asarray(jax.nn.softmax(j_out, axis=-1))
        t_hm.append(t_soft)
        j_hm.append(j_soft)
        rect = jnp.asarray(b["head_rect"])
        tgt = jnp.asarray(b["keypoint_map"])
        t_acc.append(np.asarray(pckh_curve(
            jnp.asarray(t_soft), tgt, rect, background_offset=False).accuracy))
        j_acc.append(np.asarray(pckh_curve(
            jnp.asarray(j_soft), tgt, rect, background_offset=False).accuracy))
    t_hm, j_hm = np.concatenate(t_hm), np.concatenate(j_hm)
    t_curve = np.nanmean(np.concatenate(t_acc), axis=0)
    j_curve = np.nanmean(np.concatenate(j_acc), axis=0)
    return {
        "heatmap_max_abs": float(np.max(np.abs(t_hm - j_hm))),
        "torch_heatmaps": t_hm,
        "jax_heatmaps": j_hm,
        "torch_pckh": t_curve,
        "jax_pckh": j_curve,
    }


def twin_run_classic(
    steps: int,
    batch_size: int = 2,
    inputsize: int = 64,
    n_batches: int = 4,
    seed: int = 0,
):
    """Classic-baseline twins from ONE shared init on ONE Gauss-target
    batch stream: the reference's creatModel_hourglass-family model in
    torch fp32, the same in fp64 (precision control), and this framework's
    classic_baseline production path."""
    import copy

    import torch

    stream = make_stream(n_batches, batch_size, inputsize, seed,
                         render_gauss=True)
    ref, tmodel, variables = shared_init_classic(seed)
    tmodel64 = copy.deepcopy(tmodel)
    j_losses, state = run_jax_twin_classic(ref, variables, stream, steps)
    t_losses = run_torch_twin_classic(ref, tmodel, stream, steps)
    t64_losses = run_torch_twin_classic(ref, tmodel64, stream, steps,
                                        dtype=torch.float64)
    evals = eval_twins_classic(ref, tmodel, state, stream)
    evals64 = eval_twins_classic(ref, tmodel64, state, stream)
    return {
        "torch_losses": np.asarray(t_losses),
        "torch64_losses": np.asarray(t64_losses),
        "jax_losses": np.asarray(j_losses),
        "control_heatmap_max_abs": float(
            np.max(np.abs(evals["torch_heatmaps"] - evals64["torch_heatmaps"]))),
        "control_pckh": evals64["torch_pckh"],
        **{k: v for k, v in evals.items()
           if k not in ("torch_heatmaps", "jax_heatmaps")},
    }


def twin_run(
    steps: int,
    batch_size: int = 2,
    inputsize: int = 64,
    n_batches: int = 4,
    steps_per_epoch: int = 2,
    seed: int = 0,
):
    """Three twins from ONE shared init on ONE batch stream: the reference
    in fp32, the reference in fp64 (the precision control — see
    run_torch_twin), and this framework in fp32."""
    import copy

    import torch

    stream = make_stream(n_batches, batch_size, inputsize, seed)
    ref, tmodel, variables = shared_init(seed)
    tmodel64 = copy.deepcopy(tmodel)
    j_losses, state = run_jax_twin(ref, variables, stream, steps, steps_per_epoch)
    t_losses = run_torch_twin(ref, tmodel, stream, steps, steps_per_epoch)
    t64_losses = run_torch_twin(ref, tmodel64, stream, steps, steps_per_epoch,
                                dtype=torch.float64)
    evals = eval_twins(ref, tmodel, state, stream)
    # Control gap: torch-fp32 vs torch-fp64 final heatmaps/PCKh — the
    # intrinsic fp32 noise that bounds what any fp32 twin can promise.
    evals64 = eval_twins(ref, tmodel64, state, stream)
    return {
        "torch_losses": np.asarray(t_losses),
        "torch64_losses": np.asarray(t64_losses),
        "jax_losses": np.asarray(j_losses),
        "control_heatmap_max_abs": float(
            np.max(np.abs(evals["torch_heatmaps"] - evals64["torch_heatmaps"]))),
        "control_pckh": evals64["torch_pckh"],
        **{k: v for k, v in evals.items()
           if k not in ("torch_heatmaps", "jax_heatmaps")},
    }


def main():
    import argparse
    import json
    import time

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--input-size", type=int, default=64)
    p.add_argument("--n-batches", type=int, default=8)
    p.add_argument("--steps-per-epoch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--family", choices=("progressive", "classic"),
                   default="progressive")
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()
    if args.out_dir is None:
        args.out_dir = ("runs_r4/twin_train" if args.family == "progressive"
                        else "runs_r4/twin_train_classic")

    t0 = time.time()
    if args.family == "classic":
        r = twin_run_classic(
            args.steps, args.batch_size, args.input_size, args.n_batches,
            args.seed,
        )
    else:
        r = twin_run(
            args.steps, args.batch_size, args.input_size, args.n_batches,
            args.steps_per_epoch, args.seed,
        )
    rel = np.abs(r["torch_losses"] - r["jax_losses"]) / np.abs(r["torch_losses"])
    rel_ctl = np.abs(r["torch_losses"] - r["torch64_losses"]) / np.abs(
        r["torch_losses"])
    os.makedirs(args.out_dir, exist_ok=True)
    np.savez(
        os.path.join(args.out_dir, "twin_losses.npz"),
        torch_losses=r["torch_losses"],
        torch64_losses=r["torch64_losses"],
        jax_losses=r["jax_losses"],
        torch_pckh=r["torch_pckh"],
        jax_pckh=r["jax_pckh"],
        control_pckh=r["control_pckh"],
    )
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    a1.plot(r["torch_losses"], label="reference (torch fp32, real source)", lw=2)
    a1.plot(r["jax_losses"], label="this framework (JAX fp32)", lw=1, ls="--")
    a1.plot(r["torch64_losses"], label="control (torch fp64)", lw=0.8, ls=":")
    a1.set_xlabel("step"), a1.set_ylabel("total loss"), a1.legend()
    a1.set_title("Twin training from one shared init")
    a2.semilogy(rel, label="JAX vs torch-fp32")
    a2.semilogy(rel_ctl, label="torch-fp32 vs fp64 (intrinsic fp32 noise)")
    a2.set_xlabel("step"), a2.set_ylabel("|Δloss| / loss"), a2.legend()
    a2.set_title("Per-step relative divergence")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "twin_losses.png"), dpi=120)

    summary = {
        "family": args.family,
        "steps": args.steps,
        "batch_size": args.batch_size,
        "input_size": args.input_size,
        "n_batches": args.n_batches,
        "steps_per_epoch": args.steps_per_epoch,
        "max_rel_loss_diff": float(rel.max()),
        "final_rel_loss_diff": float(rel[-1]),
        "control_max_rel_loss_diff": float(rel_ctl.max()),
        "final_heatmap_max_abs_diff": r["heatmap_max_abs"],
        "control_heatmap_max_abs_diff": r["control_heatmap_max_abs"],
        "torch_pckh@0.5": float(r["torch_pckh"][-1]),
        "jax_pckh@0.5": float(r["jax_pckh"][-1]),
        "control_pckh@0.5": float(r["control_pckh"][-1]),
        "pckh_curve_max_abs_diff": float(
            np.max(np.abs(r["torch_pckh"] - r["jax_pckh"]))
        ),
        "wall_seconds": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root (the package)
    sys.path.insert(0, here)  # tests/ (reference_source, parity transfer)
    main()
