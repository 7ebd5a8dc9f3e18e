from .analysis import count_flops, count_params, param_table  # noqa: F401
from .timing import measure_latency, measure_throughput  # noqa: F401
