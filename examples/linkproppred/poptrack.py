"""PopTrack link prediction (parameter-free popularity baseline).

Parity: /root/reference/examples/linkproppred/poptrack.py — PopTrack memory
initialized on training edges, val/test MRR against TGB candidates.
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
from tgm_tpu.nn import PopTrackPredictor


def evaluate(setup, args, split, dg, model) -> float:
    rrs = []
    with setup.hm.activate(split):
        for batch in DGDataLoader(dg, args.bsize, hook_manager=setup.hm):
            src = np.asarray(batch.edge_src)
            dst = np.asarray(batch.edge_dst)
            t = np.asarray(batch.edge_time)
            valid = np.asarray(batch.edge_valid)
            cands = np.asarray(batch.neg_batch_list)
            B, Q = cands.shape
            pos = model(src, dst)
            neg = model(np.repeat(src, Q), cands.reshape(-1)).reshape(B, Q)
            rr = np.asarray(mrr_per_edge(pos, neg, neg_valid=cands != PADDED_NODE_ID))
            rrs.append(rr[valid])
            model.update(src[valid], dst[valid], t[valid])
    return float(np.concatenate(rrs).mean())


def main():
    p = base_parser("PopTrack link prediction")
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--decay", type=float, default=0.9)
    args = p.parse_args()
    setup = setup_linkpred(args)

    model = PopTrackPredictor(
        np.asarray(setup.train_dg.edge_src),
        np.asarray(setup.train_dg.edge_dst),
        np.asarray(setup.train_dg.edge_time),
        num_nodes=setup.num_nodes,
        k=min(args.k, setup.num_nodes),
        decay=args.decay,
    )
    t0 = time.perf_counter()
    val_mrr = evaluate(setup, args, "val", setup.val_dg, model)
    test_mrr = evaluate(setup, args, "test", setup.test_dg, model)
    dt = time.perf_counter() - t0
    n = setup.val_dg.num_edge_events + setup.test_dg.num_edge_events
    print(f"val_mrr={val_mrr:.4f} test_mrr={test_mrr:.4f} events/s={n / dt:.0f}")


if __name__ == "__main__":
    main()
