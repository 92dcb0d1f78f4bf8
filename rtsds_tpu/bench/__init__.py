from rtsds_tpu.bench.latency import latency_benchmark  # noqa: F401
from rtsds_tpu.bench.flops import cost_analysis, count_parameters  # noqa: F401
