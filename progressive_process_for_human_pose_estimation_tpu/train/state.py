"""Train state pytree + optimizer factory.

Reference training setup (/root/reference/train.py:834-837): Adam with
lr 1e-4, apex AMP O1. The unusual eps=1e-4 appears ONLY in train.py and
hourglass_compare.py:885 (load-bearing for fp16 there); all try_* scripts
use torch's default 1e-8 — config.ExperimentConfig.adam_eps carries the
faithful per-experiment value. Here: optax adam, bf16 compute with fp32
params (no loss scaling needed on TPU), state as a pytree that jit/pjit
can donate.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    epoch: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def make_optimizer(learning_rate: float = 1e-4, eps: float = 1e-4):
    """Adam. eps defaults to the flagship train.py:834 value (1e-4); note
    that only train.py and hourglass_compare.py:885 pass that eps — every
    try_* script uses torch's default 1e-8 (config.ExperimentConfig.adam_eps
    carries the per-experiment value)."""
    return optax.adam(learning_rate, eps=eps)


def create_train_state(
    model, rng, sample_input, learning_rate: float = 1e-4, eps: float = 1e-4
):
    import jax.numpy as jnp

    variables = model.init(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(learning_rate, eps=eps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
