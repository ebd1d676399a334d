"""Persistent forecast node-property baseline.

Parity: /root/reference/examples/nodeproppred/persistant_forecast.py — predict
each labeled node's previous label vector (last seen label), NDCG@10 eval.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.eval.metrics import ndcg_at_k
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="Persistent forecast nodeproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--num-classes", type=int, default=10)
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset, node_label_classes=args.num_classes)
    num_classes = data.node_y.shape[1]
    splits = data.split()
    last_label = np.zeros((data.num_nodes, num_classes), dtype=np.float32)

    names = ["train", "val", "test"][: len(splits)]
    for name, split in zip(names, splits):
        dg = DGraph(split)
        scores = []
        for batch in DGDataLoader(dg, args.bsize):
            if batch.node_y_nids is None:
                continue
            nids = np.asarray(batch.node_y_nids)
            valid = np.asarray(batch.node_y_valid)
            y = np.asarray(batch.node_y)
            if not valid.any():
                continue
            pred = last_label[np.clip(nids, 0, data.num_nodes - 1)]
            scores.append(
                float(ndcg_at_k(pred[valid], y[valid], k=10))
            )
            last_label[nids[valid]] = y[valid]
        if scores:
            print(f"{name}_ndcg={np.mean(scores):.4f}")


if __name__ == "__main__":
    main()
