"""Base3 link prediction: EdgeBank + t-CoMem ensemble.

Parity: /root/reference/examples/linkproppred/base3.py — average of
EdgeBank and t-CoMem scores per query, streaming updates per batch.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._linkpred_common import base_parser, setup_linkpred
from tgm_tpu import DGDataLoader
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_per_edge
from tgm_tpu.nn import EdgeBankPredictor, tCoMemPredictor


def evaluate(setup, args, split, dg, eb, tc) -> float:
    rrs = []
    with setup.hm.activate(split):
        for batch in DGDataLoader(dg, args.bsize, hook_manager=setup.hm):
            src = np.asarray(batch.edge_src)
            dst = np.asarray(batch.edge_dst)
            t = np.asarray(batch.edge_time)
            valid = np.asarray(batch.edge_valid)
            cands = np.asarray(batch.neg_batch_list)
            B, Q = cands.shape
            q_src = np.repeat(src, Q)
            q_dst = cands.reshape(-1)
            pos = (eb(src, dst) + tc(src, dst)) / 2
            neg = ((eb(q_src, q_dst) + tc(q_src, q_dst)) / 2).reshape(B, Q)
            rr = np.asarray(mrr_per_edge(pos, neg, neg_valid=cands != PADDED_NODE_ID))
            rrs.append(rr[valid])
            eb.update(src[valid], dst[valid], t[valid])
            tc.update(src[valid], dst[valid], t[valid])
    return float(np.concatenate(rrs).mean())


def main():
    p = base_parser("Base3 (EdgeBank + t-CoMem) link prediction")
    p.add_argument("--window-ratio", type=float, default=0.15)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--co-occur", type=float, default=0.8)
    args = p.parse_args()
    setup = setup_linkpred(args)

    src = np.asarray(setup.train_dg.edge_src)
    dst = np.asarray(setup.train_dg.edge_dst)
    ts = np.asarray(setup.train_dg.edge_time)
    eb = EdgeBankPredictor(src, dst, ts, memory_mode="fixed", window_ratio=args.window_ratio)
    tc = tCoMemPredictor(
        src, dst, ts, num_nodes=setup.num_nodes, k=min(args.k, setup.num_nodes),
        window_ratio=args.window_ratio, co_occurrence_weight=args.co_occur,
    )
    t0 = time.perf_counter()
    val_mrr = evaluate(setup, args, "val", setup.val_dg, eb, tc)
    test_mrr = evaluate(setup, args, "test", setup.test_dg, eb, tc)
    dt = time.perf_counter() - t0
    n = setup.val_dg.num_edge_events + setup.test_dg.num_edge_events
    print(f"val_mrr={val_mrr:.4f} test_mrr={test_mrr:.4f} events/s={n / dt:.0f}")


if __name__ == "__main__":
    main()
