"""Headline benchmark: images/sec/chip, 8-stack hourglass, 256x256, bf16.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The
baseline target is 5,000 images/sec/chip on TPU v5e (BASELINE.md).

The default graph is the tail-folded eval form (exact final-output math,
same params — see models/recursive.py and tests/test_fold_tail.py); pass
``--no-fold`` for the literal all-stack-outputs graph.

Methodology: the remote-TPU tunnel makes ``block_until_ready`` unreliable
and adds tens of ms of dispatch latency per call, so the model is iterated
N times inside a single jitted ``lax.fori_loop`` (input perturbed each
iteration to defeat CSE) ending in a scalar readback that forces real
execution; per-iteration time comes from differencing two N values, which
cancels the fixed dispatch+readback overhead. This replaces the reference's
manual latency loop (/root/reference/hourglass_compare.py:1263-1273).
"""

import json
import sys

import jax
import jax.numpy as jnp


def timed_throughput(apply_fn, x, batch: int, n_lo: int = 2, n_hi: int = 12):
    # One harness for every bench: bench/timing.measure_throughput (same
    # loop-inside-jit + two-point differencing, plus the auto-widening guard
    # against sub-jitter spans).
    from progressive_process_for_human_pose_estimation_tpu.bench.timing import (
        measure_throughput,
    )

    _, dt_iter = measure_throughput(apply_fn, x, n_lo=n_lo, n_hi=n_hi)
    return batch / dt_iter, dt_iter


def roofline():
    """Measure the chip's achievable ceilings and the flagship's MFU.

    Prints the roofline math the headline number must be judged against:
    measured peak matmul/conv TFLOPs (NOT datasheet numbers), the flagship's
    analytic FLOPs/image, the achieved TFLOPs at the headline throughput, and
    what the 5,000 img/s BASELINE target would require. See BASELINE.md
    "Roofline" for the recorded values and the conclusion.
    """
    from progressive_process_for_human_pose_estimation_tpu.bench.components import (
        measure_conv_peak,
        measure_matmul_peak,
    )
    from progressive_process_for_human_pose_estimation_tpu.models import build_model

    matmul_peak = measure_matmul_peak(8192)
    conv_peak = measure_conv_peak(8, 64, 256)

    batch = 8
    model = build_model("hourglass8_skeleton", use_running_average=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    lowered = jax.jit(lambda xx: model.apply(variables, xx)).lower(x)
    cost = lowered.compile().cost_analysis()
    flops_per_img = float(cost["flops"]) / batch

    ips, _ = timed_throughput(
        lambda xx: model.apply(variables, xx), x, batch, n_lo=4, n_hi=40
    )
    achieved = ips * flops_per_img / 1e12
    print(
        json.dumps(
            {
                "matmul_peak_tflops": round(matmul_peak, 1),
                "conv_peak_tflops": round(conv_peak, 1),
                "flagship_gflop_per_img": round(flops_per_img / 1e9, 2),
                "headline_img_per_sec": round(ips, 1),
                "achieved_tflops": round(achieved, 1),
                "mfu_vs_conv_peak": round(achieved / conv_peak, 3),
                "tflops_needed_for_5000_img_s": round(5000 * flops_per_img / 1e12, 1),
            }
        )
    )


def train_bench():
    """Training-step throughput (fwd+bwd+Adam+BN stats), best measured remat
    config (see bench/timing.measure_train_throughput for the DCE-proof
    methodology and ROUND3_NOTES for the sweep that picked this config)."""
    from progressive_process_for_human_pose_estimation_tpu.bench.timing import (
        measure_train_throughput,
    )
    from progressive_process_for_human_pose_estimation_tpu.models import build_model

    model = build_model("hourglass8_skeleton", remat=True, remat_policy="dots")
    ips, _ = measure_train_throughput(model, batch=8)
    print(
        json.dumps(
            {
                "metric": "training images/sec/chip, 8-stack hourglass, "
                          "256x256, bf16, fwd+bwd+Adam",
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": None,
            }
        )
    )


def train_sweep():
    """Remat-config sweep for the training step (one JSON line per config)."""
    from progressive_process_for_human_pose_estimation_tpu.bench.timing import (
        measure_train_throughput,
    )
    from progressive_process_for_human_pose_estimation_tpu.models import build_model

    flag = "hourglass8_skeleton"
    prog = "progressive_mpii"
    configs = [
        ("no_remat_b8", flag, dict(), 8),
        ("remat_b8", flag, dict(remat=True), 8),
        ("remat_nocse_b8", flag, dict(remat=True, remat_prevent_cse=False), 8),
        ("remat_dots_b8", flag, dict(remat=True, remat_policy="dots"), 8),
        # VERDICT r4 8c: dots + saved maxpools — backward recomputes only
        # elementwise glue (BN affine/ReLU/adds), nothing windowed.
        ("remat_dots_pools_b8", flag,
         dict(remat=True, remat_policy="dots_and_pools"), 8),
        ("scan_remat_dots_pools_b8", flag,
         dict(scan_stacks=True, remat=True, remat_policy="dots_and_pools"), 8),
        ("remat_dnb_b8", flag, dict(remat=True, remat_policy="dots_no_batch"), 8),
        ("remat_b4", flag, dict(remat=True), 4),
        ("remat_b6", flag, dict(remat=True), 6),
        ("scan_b8", flag, dict(scan_stacks=True), 8),
        ("scan_remat_b8", flag, dict(scan_stacks=True, remat=True), 8),
        ("scan_remat_dots_b8", flag,
         dict(scan_stacks=True, remat=True, remat_policy="dots"), 8),
        ("scan_remat_b16", flag, dict(scan_stacks=True, remat=True), 16),
        ("remat_dots_b12", flag, dict(remat=True, remat_policy="dots"), 12),
        ("remat_dots_b16", flag, dict(remat=True, remat_policy="dots"), 16),
        ("prog_b8", prog, dict(), 8),
        ("prog_b16", prog, dict(), 16),
        ("prog_b32", prog, dict(), 32),
        ("prog_remat_b16", prog, dict(remat=True), 16),
    ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    for name, preset, kw, batch in configs:
        if only and not any(s in name for s in only):
            continue
        model = build_model(preset, **kw)
        try:
            ips, dt = measure_train_throughput(model, batch=batch)
            print(json.dumps({"config": name, "img_per_sec": round(ips, 1),
                              "ms_per_step": round(dt * 1e3, 2)}), flush=True)
        except Exception as e:  # keep sweeping past OOM/compile failures
            print(json.dumps({"config": name, "error": str(e)[:200]}), flush=True)


def int8_bench():
    """End-to-end flagship throughput with the fused-Pallas int8 path
    (pallas_kernels/int8_fused.py) vs the exact-bf16 headline. Also prints
    the XLA-formulation int8 number (the round-2 path that loses to bf16)
    so the fused kernel's effect is visible."""
    from progressive_process_for_human_pose_estimation_tpu.models import build_model
    from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_fused import (
        build_int8_pallas_apply,
    )
    from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.int8_infer import (
        build_int8_apply,
        calibrate,
    )

    batch = 8
    model = build_model("hourglass8_skeleton", use_running_average=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)

    ips_bf16, _ = timed_throughput(
        lambda xx: model.apply(variables, xx), x, batch, n_lo=4, n_hi=40
    )
    scales = calibrate(model, variables, x)
    results = {"bf16": round(ips_bf16, 1)}
    for name, fast in (
        ("int8_fused_pallas", build_int8_pallas_apply(model, variables, scales)),
        ("int8_xla", build_int8_apply(model, variables, scales)),
    ):
        try:
            ips, _ = timed_throughput(fast, x, batch, n_lo=4, n_hi=40)
            results[name] = round(ips, 1)
        except Exception as e:
            results[name] = f"error: {str(e)[:160]}"
        print(json.dumps({k: v for k, v in results.items()}), flush=True)
    print(
        json.dumps(
            {
                "metric": "images/sec/chip, 8-stack hourglass, 256x256, "
                          "int8 fused pallas",
                "value": results.get("int8_fused_pallas"),
                "unit": "images/sec",
                "vs_baseline": None,
                "note": "int8 ceiling ~3280 img/s at the measured 319 TOPS "
                        "(BASELINE.md); numerics differ from exact bf16",
            }
        )
    )


def zoo_bench():
    """Model-zoo throughput table (VERDICT r3 item 8): EVERY EXPERIMENTS
    preset measured on the CURRENT harness in one session — faithful
    eval-BN mode per experiment, 256x256, batch 8, bf16; running-stat
    models additionally measured with the folded tail where the family
    supports it. Replaces the stale round-1 figures in BASELINE.md.
    Match: /root/reference/hourglass_compare.py:1263-1273 (the reference's
    own latency loop)."""
    from progressive_process_for_human_pose_estimation_tpu.config import (
        EXPERIMENTS,
    )
    from progressive_process_for_human_pose_estimation_tpu.models import (
        build_model,
    )
    from progressive_process_for_human_pose_estimation_tpu.train import (
        make_eval_apply,
    )

    batch = 8
    seen = set()
    for name, cfg in sorted(EXPERIMENTS.items()):
        if cfg.model_preset in seen:
            continue
        seen.add(cfg.model_preset)
        if cfg.model_preset == "refiner":
            # creatModelD runs at heatmap scale on concat[18ch + image].
            x = jax.random.normal(
                jax.random.PRNGKey(1), (batch, 64, 64, 20), jnp.bfloat16)
        else:
            x = jax.random.normal(
                jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)

        def measure(**kw):
            model = build_model(
                cfg.model_preset,
                use_running_average=not cfg.eval_batch_stats, **kw)
            variables = model.init(jax.random.PRNGKey(0), x)
            apply_fn = make_eval_apply(model, cfg.eval_batch_stats)
            ips, _ = timed_throughput(
                lambda xx: apply_fn(variables, xx), x, batch, n_lo=4, n_hi=40)
            return ips

        row = {
            "preset": cfg.model_preset,
            "experiment": name,
            "eval_bn": "batch" if cfg.eval_batch_stats else "running",
            "img_per_sec": round(measure(), 1),
        }
        if not cfg.eval_batch_stats:
            try:
                row["img_per_sec_folded"] = round(measure(fold_tail=True), 1)
            except TypeError:
                pass  # family without a foldable tail
        print(json.dumps(row), flush=True)


def batch_sweep():
    """Headline batch sweep (VERDICT r4 8a): the fold-tail eval graph at
    batches 8/12/16/24/32 in one session, 2 interleaved reps each."""
    from progressive_process_for_human_pose_estimation_tpu.models import build_model

    model = build_model("hourglass8_skeleton", use_running_average=True,
                        fold_tail=True)
    sizes = (8, 12, 16, 24, 32)
    reps = {b: [] for b in sizes}
    inits = {}
    for b in sizes:
        inits[b] = jax.random.normal(
            jax.random.PRNGKey(1), (b, 256, 256, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), inits[8])
    for _ in range(2):
        for b in sizes:
            ips, dt = timed_throughput(
                lambda xx: model.apply(variables, xx), inits[b], b,
                n_lo=4, n_hi=40)
            reps[b].append(round(ips, 1))
            print(json.dumps({"batch": b, "img_per_sec": reps[b]}),
                  flush=True)
    print(json.dumps({"best": {b: max(v) for b, v in reps.items()}}),
          flush=True)


def bn_ab_bench():
    """A/B the single-read fused BN statistics (VERDICT r4 item 9) on the
    flagship's faithful batch-stat eval path (the try_* scripts' test-time
    mode): exact two-pass vs pallas_kernels/bn_stats.py, interleaved reps,
    plus a numerics cross-check of the final-stack outputs."""
    import numpy as np

    from progressive_process_for_human_pose_estimation_tpu.models import build_model
    from progressive_process_for_human_pose_estimation_tpu.ops.blocks import (
        fused_bn_stats,
    )
    from progressive_process_for_human_pose_estimation_tpu.train import (
        make_eval_apply,
    )

    batch = 8
    model = build_model("hourglass8_skeleton", use_running_average=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3),
                          jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    apply_fn = make_eval_apply(model, batch_stats=True)

    # Trace-time flag: build one jitted callable per mode.
    two_pass = jax.jit(lambda xx: apply_fn(variables, xx)[-1])
    with fused_bn_stats():
        fused = jax.jit(lambda xx: apply_fn(variables, xx)[-1])
        _ = fused(x)  # compile inside the context (flag read at trace)

    a = np.asarray(two_pass(x), np.float32)
    b = np.asarray(fused(x), np.float32)
    rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
    print(json.dumps({"fused_vs_twopass_final_stack_max_rel": rel}),
          flush=True)

    reps = {"two_pass": [], "fused_stats": []}
    for _ in range(4):
        for name, fn in (("two_pass", two_pass), ("fused_stats", fused)):
            ips, _ = timed_throughput(fn, x, batch, n_lo=4, n_hi=40)
            reps[name].append(round(ips, 1))
            print(json.dumps({"config": name, "img_per_sec": reps[name]}),
                  flush=True)
    print(json.dumps({
        "medians": {k: sorted(v)[len(v) // 2] for k, v in reps.items()}
    }), flush=True)


def subtree_bench():
    """A/B the <=16^2 subtree megakernel (VERDICT r4 8b): full flagship
    eval graph, interleaved same-session reps of (a) the standard fold-tail
    flax model [the headline], (b) the BN-folded jnp fast path, (c) the
    fast path with ONE Pallas kernel spanning the whole 16^2/8^2/4^2
    subtree (pallas_kernels/subtree16.py). Prints per-rep img/s + medians +
    a bf16 numerics cross-check of (c) against (b)."""
    import numpy as np

    from progressive_process_for_human_pose_estimation_tpu.models import build_model
    from progressive_process_for_human_pose_estimation_tpu.pallas_kernels.fast_infer import (
        build_fast_apply,
    )

    batch = 8
    model = build_model("hourglass8_skeleton", use_running_average=True)
    fold = build_model("hourglass8_skeleton", use_running_average=True,
                       fold_tail=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3),
                          jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)

    fast = build_fast_apply(model, variables, residual_impl="fast")
    sub = build_fast_apply(model, variables, residual_impl="subtree")

    ref = np.asarray(fast(x)[-1], np.float32)
    got = np.asarray(sub(x)[-1], np.float32)
    rel = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
    print(json.dumps({"subtree_vs_fast_final_stack_max_rel": rel}), flush=True)

    cands = {
        "fold_tail_model": lambda xx: fold.apply(variables, xx),
        "fast_jnp": fast,
        "fast_subtree_pallas": sub,
    }
    reps = {k: [] for k in cands}
    for _ in range(4):  # interleaved reps bound session drift
        for name, fn in cands.items():
            ips, _ = timed_throughput(fn, x, batch, n_lo=4, n_hi=40)
            reps[name].append(round(ips, 1))
            print(json.dumps({"config": name, "img_per_sec": reps[name]}),
                  flush=True)
    print(json.dumps({
        "medians": {k: sorted(v)[len(v) // 2] for k, v in reps.items()}
    }), flush=True)


def main(fused_eval=False, fold_tail=False):
    from progressive_process_for_human_pose_estimation_tpu.models import build_model

    # Batch sweep on this chip (r5, fold-tail graph, 2 interleaved reps,
    # bench.py --batch-sweep): 8 -> 1545, 12 -> 718 (tiling pathology),
    # 16 -> 1576, 24 -> 1500, 32 -> 1423 img/s. Batch 16 is the repeatable
    # winner (+2% over 8; BASELINE's throughput row pins no batch), so the
    # headline runs at batch 16.
    batch = 16
    model = build_model("hourglass8_skeleton", use_running_average=True,
                        fused_eval=fused_eval, fold_tail=fold_tail)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)

    ips, dt_iter = timed_throughput(
        lambda xx: model.apply(variables, xx), x, batch, n_lo=4, n_hi=40
    )
    print(
        json.dumps(
            {
                "metric": "images/sec/chip, 8-stack hourglass, 256x256, bf16",
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(ips / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--roofline" in sys.argv:
        roofline()
    elif "--budget" in sys.argv or "--budget-bwd" in sys.argv:
        # Per-segment millisecond budget of the flagship (ROUND3_NOTES
        # table); --budget-bwd times fwd+bwd per segment (VERDICT r3 item 9).
        from progressive_process_for_human_pose_estimation_tpu.bench.components import (
            flagship_budget,
        )

        flagship_budget(backward="--budget-bwd" in sys.argv)
    elif "--zoo" in sys.argv:
        zoo_bench()
    elif "--glue-dma" in sys.argv:
        # DMA-roofline accounting of the zero-FLOP pool/upsample glue
        # (VERDICT r3 item 3 evidence).
        from progressive_process_for_human_pose_estimation_tpu.bench.components import (
            glue_dma_table,
        )

        glue_dma_table()
    elif "--subtree" in sys.argv:
        subtree_bench()
    elif "--batch-sweep" in sys.argv:
        batch_sweep()
    elif "--bn-ab" in sys.argv:
        bn_ab_bench()
    elif "--train-sweep" in sys.argv:
        train_sweep()
    elif "--train" in sys.argv:
        train_bench()
    elif "--int8" in sys.argv:
        int8_bench()
    elif "--hybrid" in sys.argv:
        # fused_eval=True: Pallas kernels at the 8²-16² hourglass levels
        # inside the standard flax model (XLA everywhere else).
        main(fused_eval=True)
    elif "--no-fold" in sys.argv:
        # The literal graph: every stack's head/merge/return convs executed
        # and all 8 intermediate outputs produced (what training supervises).
        main()
    else:
        # Default = the tail-folded inference graph: each non-final stack's
        # head/merge/return convs collapsed into ONE f->f affine — exact
        # linear algebra on the live weights (models/recursive.py, pinned
        # <=1e-6 fp32 in tests/test_fold_tail.py), producing the final-stack
        # output the reference's own eval consumes
        # (/root/reference/train.py:1132-1134). Measured on chip (same
        # session): fold 1,564.9 vs literal 1,476.2 img/s. `--fold` kept as
        # an accepted alias.
        main(fold_tail=True)
