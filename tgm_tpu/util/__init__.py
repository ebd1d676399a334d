from .logging import (
    enable_logging,
    log_device_mem,
    log_latency,
    log_metric,
    log_metrics_dict,
    pretty_number_format,
)
from .precision import resolve_bf16, tpu_default_bf16
from .seed import fork_key, seed_everything

__all__ = [
    "resolve_bf16",
    "tpu_default_bf16",
    "enable_logging",
    "log_device_mem",
    "log_latency",
    "log_metric",
    "log_metrics_dict",
    "pretty_number_format",
    "seed_everything",
    "fork_key",
]
