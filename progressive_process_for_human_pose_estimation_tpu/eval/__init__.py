from .crf import dense_crf, dense_crf_exact  # noqa: F401
from .decode import argmax_decode, local_max_nms, normalized_peak_decode  # noqa: F401
from .pckh import (  # noqa: F401
    PCKH_THRESHOLDS,
    PCKhResult,
    pckh_curve,
    pckh_gauss_curve,
    pckh_simple,
)
