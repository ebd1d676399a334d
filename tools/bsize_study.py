"""Batch-size throughput/quality trade for the scanned TGN pipeline.

The scan body is partly latency-bound, so larger batches raise edges/s — but
TGN's staged-memory semantics coarsen with batch size (fewer memory commits
per epoch), so quality must be checked before changing the default
(VERDICT r1 task 3). This study trains the fused TGN pipeline on the
wiki-shaped synthetic stream at several batch sizes with identical weights
/ seeds, reporting train edges/s and val MRR (same candidate lists for every
config).

Run on the ambient TPU: ``python tools/bsize_study.py``; writes
BSIZE_STUDY.json + BSIZE_STUDY.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    cache_dir = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES, build_stream
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    EPOCHS, Q = 3, 20
    data = build_stream(WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM)
    # 85/15 train/val split by event index.
    e1 = int(WIKI_EDGES * 0.85)
    src = data.edge_index[:, 0]
    dst = data.edge_index[:, 1]
    t = data.time[data.edge_mask]
    x = data.edge_x

    def dg_of(sl):
        return DGraph(DGData.from_raw(
            edge_time=t[sl], edge_index=np.stack([src[sl], dst[sl]], 1),
            edge_x=x[sl], time_delta="s",
        ))

    train_dg, val_dg = dg_of(slice(0, e1)), dg_of(slice(e1, WIKI_EDGES))
    rng = np.random.default_rng(1)
    lo, hi = int(dst.min()), int(dst.max())

    results = {}
    edge_x_full = jnp.asarray(x)  # FULL table: global edge ids resolve
    for B in (200, 400):
        stream = DeviceEdgeStream(train_dg, B)
        val_stream = DeviceEdgeStream(val_dg, B, edge_id_base=e1)
        nvb = val_stream.num_batches
        cands = jnp.asarray(
            rng.integers(lo, hi + 1, size=(nvb * B, Q)).astype(np.int32)
        )
        pipe = TGNPipeline(
            num_nodes=WIKI_NODES, edge_dim=WIKI_EDGE_DIM, memory_dim=100,
            embed_dim=100, time_dim=100, num_nbrs=10, lr=1e-4,
            neg_low=lo, neg_high=hi, edge_x_full=edge_x_full,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(0))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at,
                               stream.num_batches, donate_carry=False)

        def eval_epoch(c):
            def body(c, i):
                rows = lax.dynamic_slice(cands, (i * B, 0), (B, Q))
                return pipe.eval_step(c, val_stream.batch_at(i), rows)

            return lax.scan(body, c, jnp.arange(nvb))

        eval_jit = jax.jit(eval_epoch, donate_argnums=())

        mrrs, times = [], []
        for ep in range(EPOCHS):
            t0 = time.perf_counter()
            carry, losses = epoch(carry)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
            c2 = pipe.flush_all(carry)
            _, (s, cc) = eval_jit(c2)
            mrrs.append(float(jnp.sum(s) / jnp.maximum(jnp.sum(cc), 1)))
        results[B] = {
            "val_mrr": mrrs,
            "train_edges_per_sec": round(e1 / min(times[1:] or times), 1),
        }
        print(B, results[B], flush=True)

    base = results[200]["val_mrr"][-1]
    out = {
        "config": {"epochs": EPOCHS, "candidates": Q,
                   "stream": "wiki-shaped synthetic, 85/15 split"},
        "results": {str(k): v for k, v in results.items()},
        "final_mrr_delta_vs_b200": {
            str(k): round(v["val_mrr"][-1] - base, 4) for k, v in results.items()
        },
    }
    Path("BSIZE_STUDY.json").write_text(json.dumps(out, indent=2) + "\n")
    lines = [
        "# Batch size: throughput vs quality (scanned TGN, wiki shapes, v5e)",
        "",
        "| bsize | train edges/s | " + " | ".join(f"epoch {i} MRR" for i in range(EPOCHS)) + " | final ΔMRR |",
        "|---|---|" + "---|" * (EPOCHS + 1),
    ]
    for k, v in results.items():
        lines.append(
            f"| {k} | {v['train_edges_per_sec']:,} | "
            + " | ".join(f"{m:.4f}" for m in v["val_mrr"])
            + f" | {out['final_mrr_delta_vs_b200'][str(k)]:+.4f} |"
        )
    Path("BSIZE_STUDY.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(out["final_mrr_delta_vs_b200"]))


if __name__ == "__main__":
    main()
