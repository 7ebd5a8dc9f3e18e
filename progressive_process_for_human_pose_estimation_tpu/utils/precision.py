"""Mixed-precision policy for TPU.

The reference uses NVIDIA apex AMP O1 (fp16 compute + dynamic loss scaling,
/root/reference/train.py:836,895) and fp16 inference (train.py:991). On TPU the
native fast dtype is bfloat16, which shares fp32's exponent range, so no loss
scaling is needed. Parameters and BatchNorm statistics stay fp32; activations
and conv inputs are cast to the compute dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: params kept in `param_dtype`, compute in `compute_dtype`."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


# bf16 compute / fp32 params: the production policy (TPU-native analogue of
# apex O1 in the reference).
DEFAULT_POLICY = Policy()

# Full fp32: used by parity tests against the reference semantics.
PARITY_POLICY = Policy(compute_dtype=jnp.float32, output_dtype=jnp.float32)
