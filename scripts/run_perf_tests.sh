#!/usr/bin/env bash
# Performance tier: the TGN throughput benchmark (mirrors reference
# scripts/run_perf_tests.sh; runs on whatever accelerator is ambient).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py "$@"
