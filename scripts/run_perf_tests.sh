#!/usr/bin/env bash
# Performance tier (mirrors reference scripts/run_perf_tests.sh +
# test/performance/): model-training throughput via bench.py, then the
# loader/construction/discretization benchmark matrix.
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py "$@"
RUN_PERF=1 python -m pytest tests/performance -q -s -o faulthandler_timeout=900
