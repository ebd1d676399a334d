"""EdgeBank link prediction (parameter-free baseline).

Parity: /root/reference/examples/linkproppred/edgebank.py — initialize the
EdgeBank memory with the training edges, stream val/test batches through the
TGB negative sampler hook, score each positive against its candidate list by
memory membership, report MRR.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_per_edge
from tgm_tpu.hooks import HookManager, TGBNegativeEdgeSamplerHook
from tgm_tpu.nn.modules.edgebank import EdgeBankPredictor
from tgm_tpu.util import seed_everything


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="EdgeBank link prediction")
    p.add_argument("--dataset", type=str, default="synthetic", help="tgbl-* or synthetic[-N-E]")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--memory-mode", type=str, default="unlimited", choices=["unlimited", "fixed"])
    p.add_argument("--window-ratio", type=float, default=0.15)
    return p.parse_args()


def evaluate(loader, hm, key, edgebank) -> float:
    rrs = []
    with hm.activate(key):
        for batch in loader:
            src = np.asarray(batch.edge_src)
            dst = np.asarray(batch.edge_dst)
            t = np.asarray(batch.edge_time)
            valid = np.asarray(batch.edge_valid)
            cands = np.asarray(batch.neg_batch_list)  # (B, Q)

            pos = edgebank(src, dst)
            B, Q = cands.shape
            neg = edgebank(np.repeat(src, Q), cands.reshape(-1)).reshape(B, Q)
            rr = np.asarray(
                mrr_per_edge(pos, neg, neg_valid=cands != PADDED_NODE_ID)
            )
            rrs.append(rr[valid])
            edgebank.update(src[valid], dst[valid], t[valid])
    return float(np.concatenate(rrs).mean())


def main() -> None:
    args = parse_args()
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    train_data, val_data, test_data = data.split()
    train_dg, val_dg, test_dg = DGraph(train_data), DGraph(val_data), DGraph(test_data)

    hm = HookManager(keys=["val", "test"])
    if val_cands is not None:
        hm.register("val", TGBNegativeEdgeSamplerHook(candidates=val_cands))
        hm.register("test", TGBNegativeEdgeSamplerHook(candidates=test_cands))
    else:
        hm.register("val", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="val"))
        hm.register("test", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="test"))

    edgebank = EdgeBankPredictor(
        np.asarray(train_dg.edge_src),
        np.asarray(train_dg.edge_dst),
        np.asarray(train_dg.edge_time),
        memory_mode=args.memory_mode,
        window_ratio=args.window_ratio,
    )

    t0 = time.perf_counter()
    val_mrr = evaluate(DGDataLoader(val_dg, args.bsize, hook_manager=hm), hm, "val", edgebank)
    test_mrr = evaluate(DGDataLoader(test_dg, args.bsize, hook_manager=hm), hm, "test", edgebank)
    dt = time.perf_counter() - t0
    n_events = val_dg.num_edge_events + test_dg.num_edge_events
    print(f"val_mrr={val_mrr:.4f} test_mrr={test_mrr:.4f} events/s={n_events / dt:.0f}")


if __name__ == "__main__":
    main()
