"""Node analytics example.

Parity: /root/reference/examples/analytics/node_analytics_example.py —
track per-node activity stats plus batch novelty/density over the stream.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.hooks import HookManager, NodeAnalyticsHook
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="Node analytics example")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--tracked", type=int, nargs="+", default=[0, 1, 2, 3])
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset)
    dg = DGraph(data)
    hm = HookManager(keys=["analytics"])
    hm.register(
        "analytics", NodeAnalyticsHook(np.asarray(args.tracked), num_nodes=data.num_nodes)
    )

    with hm.activate("analytics"):
        for i, batch in enumerate(DGDataLoader(dg, args.bsize, hook_manager=hm)):
            ns, ms, es = batch.node_stats, batch.node_macro_stats, batch.edge_stats
            print(
                f"batch={i} tracked_degrees={np.asarray(ns['degree']).tolist()} "
                f"new_nodes={int(ms['new_node_count'])} "
                f"edge_novelty={float(es['edge_novelty']):.2f} "
                f"density={float(es['edge_density']):.4f}"
            )
            if i >= 9:
                break


if __name__ == "__main__":
    main()
