from .fast_infer import build_fast_apply  # noqa: F401
from .fused_residual import (  # noqa: F401
    fold_lite_residual_params,
    lite_residual_fast,
    lite_residual_hybrid,
    lite_residual_pallas,
)
