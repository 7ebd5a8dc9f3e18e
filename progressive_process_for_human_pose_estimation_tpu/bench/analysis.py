"""Parameter/FLOP analysis — torchstat.stat replacement (SURVEY.md §2.2.13).

The reference prints params + FLOPs via ``torchstat.stat(model, (3, 256,
256))`` (/root/reference/calculate_parameters.py:1153-1156) and dumps every
parameter tensor (lines 1167-1168). TPU-native equivalents: pytree size sums
and XLA's own ``cost_analysis()`` on the lowered computation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def count_params(params: Any) -> int:
    return sum(int(np.size(p)) for p in jax.tree.leaves(params))


def param_table(params: Any) -> List[Tuple[str, tuple, int]]:
    """Per-parameter dump (name, shape, size) —
    calculate_parameters.py:1167-1168 equivalent."""
    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        rows.append((name, tuple(np.shape(leaf)), int(np.size(leaf))))
    return rows


def count_flops(fn, *example_args) -> Dict[str, float]:
    """FLOPs + bytes accessed of a jittable fn via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }
