"""Batch analytics example.

Parity: /root/reference/examples/analytics/batch_analytics_example.py —
stream batches through the BatchAnalyticsHook and report per-batch stats.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.hooks import BatchAnalyticsHook, HookManager
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="Batch analytics example")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset)
    dg = DGraph(data)
    hm = HookManager(keys=["analytics"])
    hm.register("analytics", BatchAnalyticsHook())

    with hm.activate("analytics"):
        for i, batch in enumerate(DGDataLoader(dg, args.bsize, hook_manager=hm)):
            print(
                f"batch={i} edges={int(batch.num_edge_events)} "
                f"unique_ts={int(batch.num_unique_timestamps)} "
                f"unique_nodes={int(batch.num_unique_nodes)} "
                f"avg_degree={float(batch.avg_degree):.2f} "
                f"repeated_edges={int(batch.num_repeated_edge_events)}"
            )
            if i >= 9:
                break


if __name__ == "__main__":
    main()
