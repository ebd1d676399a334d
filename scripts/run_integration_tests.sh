#!/usr/bin/env bash
# Integration tier: 1-epoch end-to-end example runs on small synthetic data
# (mirrors the reference's Slurm integration jobs, locally runnable).
set -euo pipefail
cd "$(dirname "$0")/.."
# CPU tier by design: strip the ambient TPU-tunnel sitecustomize AND its
# platform selection (the env var alone would leave an unknown backend name).
export JAX_PLATFORMS=cpu
export PYTHONPATH=""

run() { echo "== $*"; timeout 600 python "$@" || { echo "FAILED: $*"; exit 1; }; }

run examples/linkproppred/edgebank.py --dataset synthetic-300-4000 --bsize 200
run examples/linkproppred/tgat.py --dataset synthetic-300-4000 --bsize 200 --n-nbrs 5 5 --embed-dim 32 --time-dim 16 --epochs 1
run examples/linkproppred/tgn.py --dataset synthetic-300-4000 --bsize 200 --embed-dim 32 --memory-dim 32 --time-dim 16 --epochs 1
run examples/linkproppred/gclstm.py --dataset synthetic-300-4000 --bsize 200 --embed-dim 32 --epochs 1
run examples/linkproppred/dygformer.py --dataset synthetic-300-4000 --bsize 200 --n-nbrs 5 --max-seq-len 8 --channel-dim 8 --embed-dim 32 --time-dim 8 --epochs 1
run examples/nodeproppred/tgn.py --dataset synthetic-300-4000 --bsize 100 --embed-dim 32 --memory-dim 32 --time-dim 16 --epochs 1
run examples/graphproppred/gcn.py --dataset synthetic-300-4000 --epochs 2
run examples/linkproppred/tpnet.py --dataset synthetic-300-4000 --bsize 200 --epochs 1
run examples/linkproppred/ctan.py --dataset synthetic-300-4000 --bsize 200 --epochs 1
run examples/linkproppred/tncn.py --dataset synthetic-300-4000 --bsize 200 --epochs 1
run examples/linkproppred/poptrack.py --dataset synthetic-300-4000 --bsize 200
run examples/analytics/batch_analytics_example.py --dataset synthetic-300-4000 --bsize 200
run __graft_entry__.py
echo "integration suite OK"
