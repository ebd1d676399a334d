"""Structured logging / metric / latency instrumentation.

Parity: reference logging subsystem (/root/reference/tgm/util/logging.py:11-301) —
opt-in global 'tgm' logger via env var or ``enable_logging``, human INFO +
machine-readable JSON DEBUG metric records (consumed by ``tools/log_parser.py``),
``log_latency`` / ``log_metric`` decorators. TPU addition: ``log_device_mem``
reports live HBM usage via jax instead of CUDA allocator stats.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import time
from typing import Any, Callable, Dict, Optional

_LOGGER_NAME = "tgm_tpu"
_ENV_FLAG = "TGM_LOGGING_ENABLED"

_logging_enabled = os.environ.get(_ENV_FLAG, "").lower() in ("1", "true", "yes")


def _get_logger(name: Optional[str] = None) -> logging.Logger:
    if name is None or name == _LOGGER_NAME:
        return logging.getLogger(_LOGGER_NAME)
    if not name.startswith(_LOGGER_NAME):
        name = f"{_LOGGER_NAME}.{name}"
    return logging.getLogger(name)


def enable_logging(
    log_level: int = logging.INFO,
    log_file_path: Optional[str] = None,
    file_log_level: int = logging.DEBUG,
) -> None:
    """Turn on framework logging with console (and optional file) handlers."""
    global _logging_enabled
    _logging_enabled = True

    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(min(log_level, file_log_level) if log_file_path else log_level)
    logger.handlers.clear()

    console = logging.StreamHandler()
    console.setLevel(log_level)
    console.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(console)

    if log_file_path:
        os.makedirs(os.path.dirname(os.path.abspath(log_file_path)), exist_ok=True)
        fh = logging.FileHandler(log_file_path)
        fh.setLevel(file_log_level)
        fh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(fh)


def is_logging_enabled() -> bool:
    return _logging_enabled


def log_metric(metric: str, value: Any, **extra: Any) -> None:
    """Emit a metric: human-readable at INFO, JSON machine record at DEBUG.

    The JSON line format ``{"metric": ..., "value": ...}`` matches the contract
    parsed by ``tools/log_parser.py``.
    """
    logger = _get_logger()
    logger.info("%s = %s", metric, pretty_number_format(value))
    record: Dict[str, Any] = {"metric": metric, "value": _jsonable(value)}
    record.update({k: _jsonable(v) for k, v in extra.items()})
    logger.debug(json.dumps(record))


def log_metrics_dict(metrics: Dict[str, Any], prefix: str = "") -> None:
    for k, v in metrics.items():
        log_metric(f"{prefix}{k}", v)


def _jsonable(v: Any) -> Any:
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        try:
            return float(v)
        except (TypeError, ValueError):
            return str(v)


def log_latency(fn: Optional[Callable] = None, *, level: int = logging.DEBUG) -> Callable:
    """Decorator: time the wrapped call and emit a JSON latency record."""

    def decorate(f: Callable) -> Callable:
        @functools.wraps(f)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            if not _logging_enabled:
                return f(*args, **kwargs)
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            dt = time.perf_counter() - t0
            logger = _get_logger()
            logger.log(level, json.dumps({"metric": f"latency_{f.__qualname__}", "value": dt, "unit": "s"}))
            return out

        return wrapper

    if fn is not None:
        return decorate(fn)
    return decorate


def log_device_mem(fn: Optional[Callable] = None, *, level: int = logging.DEBUG) -> Callable:
    """Decorator: log per-device HBM bytes-in-use after the wrapped call.

    TPU analog of the reference's ``log_gpu`` CUDA-memory decorator.
    """

    def decorate(f: Callable) -> Callable:
        @functools.wraps(f)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            out = f(*args, **kwargs)
            if _logging_enabled:
                try:
                    import jax

                    stats = jax.devices()[0].memory_stats() or {}
                    in_use = stats.get("bytes_in_use")
                    if in_use is not None:
                        _get_logger().log(
                            level,
                            json.dumps(
                                {"metric": f"device_mem_{f.__qualname__}", "value": int(in_use), "unit": "bytes"}
                            ),
                        )
                except Exception:  # pragma: no cover - platform dependent
                    pass
            return out

        return wrapper

    if fn is not None:
        return decorate(fn)
    return decorate


def pretty_number_format(v: Any) -> str:
    """Human formatting: 1234567 -> '1.23M'."""
    try:
        x = float(v)
    except (TypeError, ValueError):
        return str(v)
    if x != x:  # nan
        return "nan"
    for thresh, suffix in ((1e12, "T"), (1e9, "B"), (1e6, "M"), (1e3, "K")):
        if abs(x) >= thresh:
            return f"{x / thresh:.2f}{suffix}"
    if x == int(x):
        return str(int(x))
    return f"{x:.4f}"
