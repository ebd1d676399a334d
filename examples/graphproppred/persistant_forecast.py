"""Persistent forecast graph-property baseline.

Parity: /root/reference/examples/graphproppred/persistant_forecast.py —
predict the previous snapshot's target for the next one; MSE metric.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph, TimeDeltaDG
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="Persistent forecast graphproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--snapshot-ticks", type=int, default=200)
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset)
    coarse = data.discretize(TimeDeltaDG("s", args.snapshot_ticks))
    loader = DGDataLoader(DGraph(coarse), args.snapshot_ticks, batch_unit="s", materialize_features=False)
    counts = np.array([float(np.asarray(b.edge_valid).sum()) for b in loader])
    targets = counts / max(counts.max(), 1.0)
    preds = targets[:-1]  # predict previous value
    mse = float(np.mean((preds - targets[1:]) ** 2))
    print(f"test_mse={mse:.5f} snapshots={len(targets)}")


if __name__ == "__main__":
    main()
