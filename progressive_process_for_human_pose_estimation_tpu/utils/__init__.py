from .metrics import MetricLogger, colorize_class_map, make_grid  # noqa: F401
from .precision import Policy, DEFAULT_POLICY, PARITY_POLICY  # noqa: F401
