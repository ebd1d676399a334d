#!/usr/bin/env bash
# Unit tier: CPU-only, virtual 8-device mesh (mirrors reference
# scripts/run_unit_tests.sh; conftest forces the platform).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
