"""Always-on thin parity smoke (VERDICT r4 item 6b): one REAL-source torch
family at reduced width, in the default (non-slow) selection, so the parity
chain is never entirely deselected from the inner loop.

Uses /root/reference/only_one_hourgless.py's actual creatModel with the
module's ``nFeats`` global shrunk to 32 (the classes read the global at
instantiation; restored afterwards) — the same weight-transfer machinery as
the full-width tests in test_parity_reference.py at ~1/60th the FLOPs."""

import numpy as np

import jax
import jax.numpy as jnp

from reference_source import load_reference
from test_parity_reference import (
    assert_outputs_close,
    only_one_vars,
    randomize_bn_stats,
    run_torch,
)

from progressive_process_for_human_pose_estimation_tpu.models import (
    StackedHourglass,
)


def test_only_one_hourglass_reduced_width_parity(rng):
    import torch

    ref = load_reference("only_one_hourgless")
    orig = ref.nFeats
    try:
        ref.nFeats = 32
        torch.manual_seed(5)
        tmodel = ref.creatModel().eval()
        with torch.no_grad():
            randomize_bn_stats(tmodel, rng)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        t_outs = run_torch(tmodel, x)

        jmodel = StackedHourglass(
            features=32, n_stack=ref.nStack, out_channels=ref.nOutChannels,
            n_modules=ref.nModules, hourglass_depth=4,
            use_running_average=True, dtype=jnp.float32)
        got = only_one_vars(tmodel, ref.nStack)
        j_outs = jax.jit(lambda v, a: jmodel.apply(v, a))(got, jnp.asarray(x))
        assert_outputs_close(j_outs, t_outs)
    finally:
        ref.nFeats = orig
