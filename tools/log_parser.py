"""Offline aggregation of structured metric logs.

Parity: reference ``tools/log_parser.py:9-60``: parse JSON debug-log lines of
the form ``{"metric": ..., "value": ...}`` (the contract emitted by
``tgm_tpu.util.logging.log_metric`` / ``log_latency``) into per-metric stats
(count/mean/std/min/max/percentiles), with optional A/B comparison of two log
files.

Usage:
    python tools/log_parser.py run.log [baseline.log]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from typing import Dict, List


def parse_log(path: str) -> Dict[str, List[float]]:
    metrics: Dict[str, List[float]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                # tolerate "LEVEL:logger:{json}" style prefixes
                idx = line.find("{")
                if idx < 0:
                    continue
                line = line[idx:]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(rec, dict) and "metric" in rec and "value" in rec:
                try:
                    metrics[str(rec["metric"])].append(float(rec["value"]))
                except (TypeError, ValueError):
                    continue
    return dict(metrics)


def summarize(values: List[float]) -> Dict[str, float]:
    import numpy as np

    arr = np.asarray(values, dtype=np.float64)
    return {
        "count": int(arr.size),
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "p50": float(np.percentile(arr, 50)),
        "p90": float(np.percentile(arr, 90)),
        "p99": float(np.percentile(arr, 99)),
        "max": float(arr.max()),
    }


def report(path: str, baseline: str | None = None) -> Dict[str, Dict[str, float]]:
    metrics = {k: summarize(v) for k, v in parse_log(path).items()}
    if baseline is None:
        return metrics
    base = {k: summarize(v) for k, v in parse_log(baseline).items()}
    out: Dict[str, Dict[str, float]] = {}
    for k, stats in metrics.items():
        out[k] = dict(stats)
        if k in base and base[k]["mean"] != 0:
            out[k]["vs_baseline_mean"] = stats["mean"] / base[k]["mean"]
    return out


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    baseline = sys.argv[2] if len(sys.argv) > 2 else None
    out = report(sys.argv[1], baseline)
    print(json.dumps(out, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
