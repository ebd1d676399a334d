#!/usr/bin/env bash
# Performance tier (mirrors reference scripts/run_perf_tests.sh +
# test/performance/): model-training throughput via bench.py, then the
# loader/construction/discretization benchmark matrix. Each benchmark group
# runs in its own process — a long pytest session accumulates tens of GB of
# allocator state on the CPU backend and the late matrix cells slow down by
# orders of magnitude (measured; see tests/performance/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py "$@"
export RUN_PERF=1
python -m pytest tests/performance/test_construction.py -q -s -o faulthandler_timeout=900
python -m pytest tests/performance/test_discretization.py -q -s -o faulthandler_timeout=900
python -m pytest tests/performance/test_iteration.py -q -s -o faulthandler_timeout=900 -k wiki
python -m pytest tests/performance/test_iteration.py -q -s -o faulthandler_timeout=900 -k trade
