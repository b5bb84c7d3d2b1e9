from vpt_tpu.utils.metrics import MetricsLogger
from vpt_tpu.utils.profiling import profile_trace, activation_stats

__all__ = ["MetricsLogger", "profile_trace", "activation_stats"]
