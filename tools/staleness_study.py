"""Quantify the quality cost of stale temporal-axis parallelism.

``tgm_tpu.parallel.temporal`` offers two execution modes for sharding the
time-sorted stream across devices: ``chain`` (exact, sequential-equivalent)
and ``stale`` (DistTGL-style: spans run concurrently from a one-span-stale
state, merged owner-wise). The staleness trades quality for wall-clock — this
study measures that trade on a synthetic wiki-shaped stream:

1. baseline: plain scanned training (1 span);
2. chain(n): must reproduce the baseline EXACTLY (asserted);
3. stale(n) for n in {2, 4, 8}: val MRR delta vs baseline per epoch.

Writes STALENESS.md + STALENESS.json. CPU-runnable (forced), a few minutes.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.parallel.temporal import (
        chain_epoch,
        merge_stale_carries,
        stale_parallel_epoch,
        stale_resync_epoch,
    )
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    rng = np.random.default_rng(0)
    N, E, D, B, Q, EPOCHS = 400, 8000, 16, 100, 10, 3
    pop = rng.zipf(1.4, size=N).astype(np.float64)
    pop /= pop.sum()
    src = rng.choice(N, size=E, p=pop).astype(np.int64)
    dst = rng.choice(N, size=E, p=pop).astype(np.int64)
    dst = np.where(dst == src, (dst + 1) % N, dst)
    t = np.sort(rng.integers(0, 400_000, E))
    x = rng.normal(size=(E, D)).astype(np.float32)

    e1 = int(E * 0.85)

    def dg_of(sl):
        return DGraph(DGData.from_raw(
            edge_time=t[sl], edge_index=np.stack([src[sl], dst[sl]], 1),
            edge_x=x[sl], time_delta="s",
        ))

    train_dg, val_dg = dg_of(slice(0, e1)), dg_of(slice(e1, E))
    val_E = E - e1
    n_val_batches = -(-val_E // B)
    cands = rng.integers(int(dst.min()), int(dst.max()) + 1,
                         size=(n_val_batches * B, Q)).astype(np.int32)
    cands_dev = jnp.asarray(cands)

    edge_x_full = jnp.asarray(x)  # FULL table: global edge ids resolve

    def build():
        stream = DeviceEdgeStream(train_dg, B)
        val_stream = DeviceEdgeStream(val_dg, B, edge_id_base=e1)
        pipe = TGNPipeline(
            num_nodes=N, edge_dim=D, memory_dim=32, embed_dim=32, time_dim=16,
            num_nbrs=10, lr=5e-4, neg_low=int(dst.min()), neg_high=int(dst.max()),
            edge_x_full=edge_x_full,
        )
        return pipe, stream, val_stream

    def val_mrr(pipe, val_stream, carry):
        carry = pipe.flush_all(carry)

        def step(c, i):
            b = val_stream.batch_at(i)
            rows = jax.lax.dynamic_slice(cands_dev, (i * B, 0), (B, Q))
            c, (s, cc) = pipe.eval_step(c, b, rows)
            return c, (s, cc)

        _, (s, c) = jax.lax.scan(
            jax.jit(step), carry, jnp.arange(val_stream.num_batches)
        )
        return float(jnp.sum(s) / jnp.maximum(jnp.sum(c), 1.0))

    results = {}

    # --- baseline: one scan ------------------------------------------- #
    pipe, stream, val_stream = build()
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches,
                           donate_carry=False)
    base_mrr, base_losses = [], []
    for _ in range(EPOCHS):
        carry, losses = epoch(carry)
        base_losses.append(np.asarray(losses))
        base_mrr.append(val_mrr(pipe, val_stream, carry))
    results["baseline"] = base_mrr

    # --- chain: must be EXACT ----------------------------------------- #
    pipe, stream, val_stream = build()
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    chain_mrr = []
    for ep in range(EPOCHS):
        carry, losses = jax.jit(
            lambda c: chain_epoch(pipe.train_step, stream.batch_at, c,
                                  stream.num_batches, 4),
        )(carry)
        np.testing.assert_allclose(
            np.asarray(losses), base_losses[ep], rtol=1e-6, atol=1e-6,
            err_msg="chain mode must reproduce sequential training exactly",
        )
        chain_mrr.append(val_mrr(pipe, val_stream, carry))
    results["chain4"] = chain_mrr

    # --- stale(n) ------------------------------------------------------ #
    for n_spans in (2, 4, 8):
        pipe, stream, val_stream = build()
        carry = pipe.init_carry(jax.random.PRNGKey(0))
        mrrs = []
        stale = jax.jit(
            lambda c: stale_parallel_epoch(pipe.train_step, stream.batch_at, c,
                                           stream.num_batches, n_spans)
        )
        for _ in range(EPOCHS):
            carries, _ = stale(carry)
            carry = merge_stale_carries(carries, N)
            mrrs.append(val_mrr(pipe, val_stream, carry))
        results[f"stale{n_spans}"] = mrrs

    # --- stale(n) + periodic resync ------------------------------------ #
    # Bounded staleness: R owner-wise merges per epoch shrink the staleness
    # window from num_batches/n to num_batches/(R*n).
    for n_spans, rounds in ((4, 2), (4, 4), (4, 8), (8, 8)):
        pipe, stream, val_stream = build()
        carry = pipe.init_carry(jax.random.PRNGKey(0))
        mrrs = []
        resync = jax.jit(
            lambda c, _n=n_spans, _r=rounds: stale_resync_epoch(
                pipe.train_step, stream.batch_at, c, stream.num_batches,
                _n, N, _r,
            )[0]
        )
        for _ in range(EPOCHS):
            carry = resync(carry)
            mrrs.append(val_mrr(pipe, val_stream, carry))
        results[f"stale{n_spans}_resync{rounds}"] = mrrs

    # --- multi-seed tier: the single-run deltas above are chaos-dominated
    # (epoch-to-epoch MRR swings of +-0.08 on this stream; cf. the TGAT
    # ulp-control in PARITY_ZOO_r03). The 4-span verdict therefore comes
    # from mean final-MRR deltas across seeds.
    SEEDS = 5
    multi = {"baseline": [], "stale4": [], "stale4_resync4": [],
             "stale4_resync8": [], "stale4_resync4_stateonly": [],
             "stale4_resync8_stateonly": []}
    for seed in range(SEEDS):
        pipe, stream, val_stream = build()
        carry = pipe.init_carry(jax.random.PRNGKey(seed))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at,
                               stream.num_batches, donate_carry=False)
        for _ in range(EPOCHS):
            carry, _ = epoch(carry)
        multi["baseline"].append(val_mrr(pipe, val_stream, carry))

        pipe, stream, val_stream = build()
        carry = pipe.init_carry(jax.random.PRNGKey(seed))
        stale = jax.jit(
            lambda c: stale_parallel_epoch(pipe.train_step, stream.batch_at,
                                           c, stream.num_batches, 4)
        )
        for _ in range(EPOCHS):
            carries, _ = stale(carry)
            carry = merge_stale_carries(carries, N)
        multi["stale4"].append(val_mrr(pipe, val_stream, carry))

        for rounds in (4, 8):
            for state_only in (False, True):
                pipe, stream, val_stream = build()
                carry = pipe.init_carry(jax.random.PRNGKey(seed))
                resync = jax.jit(
                    lambda c, _r=rounds, _so=state_only: stale_resync_epoch(
                        pipe.train_step, stream.batch_at, c,
                        stream.num_batches, 4, N, _r,
                        merge_params_each_round=not _so,
                    )[0]
                )
                for _ in range(EPOCHS):
                    carry = resync(carry)
                name = f"stale4_resync{rounds}" + ("_stateonly" if state_only else "")
                multi[name].append(val_mrr(pipe, val_stream, carry))

    base_mean = float(np.mean(multi["baseline"]))
    multiseed = {
        k: {
            "final_mrr_per_seed": [round(v, 4) for v in vals],
            "mean": round(float(np.mean(vals)), 4),
            "std": round(float(np.std(vals)), 4),
            "mean_delta_vs_baseline": round(float(np.mean(vals)) - base_mean, 4),
        }
        for k, vals in multi.items()
    }

    out = {
        "config": {"nodes": N, "edges": E, "bsize": B, "epochs": EPOCHS,
                   "candidates": Q, "lr": 5e-4, "multiseed_seeds": SEEDS},
        "val_mrr": results,
        "delta_vs_baseline_final_epoch": {
            k: round(v[-1] - results["baseline"][-1], 4)
            for k, v in results.items()
        },
        "multiseed": multiseed,
    }
    Path("STALENESS.json").write_text(json.dumps(out, indent=2) + "\n")

    lines = [
        "# Stale temporal-parallel mode: quality cost",
        "",
        "Generated by tools/staleness_study.py (synthetic wiki-shaped stream,",
        f"{N} nodes / {E} edges, batch {B}, {EPOCHS} epochs, {Q} candidates/edge).",
        "",
        "| mode | " + " | ".join(f"epoch {i} MRR" for i in range(EPOCHS)) + " | final delta |",
        "|---|" + "---|" * (EPOCHS + 1),
    ]
    for k, v in results.items():
        delta = out["delta_vs_baseline_final_epoch"][k]
        lines.append(
            f"| {k} | " + " | ".join(f"{m:.4f}" for m in v) + f" | {delta:+.4f} |"
        )
    lines += [
        "",
        "`chain` is asserted batch-loss-exact vs sequential training.",
        "`stale(n)` runs n spans concurrently from a one-span-stale state with",
        "owner-wise merge + parameter averaging; the table above is the",
        "measured MRR cost of that staleness on this stream.",
        "`stale(n)_resync(R)` adds R owner-wise merges per epoch (bounded",
        "staleness: window num_batches/(R*n)); spans still run fully in",
        "parallel inside each round, so the wall-clock scaling of stale mode",
        "is preserved at R extra merge collectives per epoch.",
        "",
        "## Multi-seed verdict (4 spans)",
        "",
        "Single-run deltas are chaos-dominated on this stream; means over",
        f"{out['config']['multiseed_seeds']} seeds:",
        "",
        "| mode | mean final MRR | std | mean delta vs baseline |",
        "|---|---|---|---|",
        *[
            f"| {k} | {v['mean']:.4f} | {v['std']:.4f} | "
            f"{v['mean_delta_vs_baseline']:+.4f} |"
            for k, v in multiseed.items()
        ],
    ]
    Path("STALENESS.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(out["delta_vs_baseline_final_epoch"], indent=2))


if __name__ == "__main__":
    main()
