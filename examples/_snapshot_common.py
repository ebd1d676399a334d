"""Shared scaffolding for snapshot (DTDG) link-prediction examples.

Mirrors the reference's snapshot flow (/root/reference/examples/linkproppred/
gclstm.py:187-208): a discretized snapshot loader advances the recurrent
state while an event loader drives prediction batches; BPTT truncates at
snapshot boundaries.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

from tgm_tpu import DGDataLoader, DGraph, TimeDeltaDG
from tgm_tpu.hooks import HookManager, RandomNegativeEdgeSamplerHook


def snapshot_train_loop(
    args,
    train_data,
    num_nodes: int,
    snapshot_step: Callable[[Any, Any], Any],
    init_recurrent: Callable[[], Any],
    train_step: Callable[[Any, Any], float],
):
    """Run epochs of (snapshot-advance, predict) with truncation.

    ``snapshot_step(rec_state, snapshot_batch) -> (z, rec_state)`` advances the
    recurrence; ``train_step(z, batch) -> loss`` trains on prediction batches.
    """
    coarse = TimeDeltaDG("s", args.snapshot_ticks)
    train_snap = DGraph(train_data.discretize(coarse))
    train_dg = DGraph(train_data)

    hm = HookManager(keys=["train"])
    dst = train_dg.edge_dst
    hm.register("train", RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max())))

    conversion = args.snapshot_ticks
    n_edges = train_dg.num_edge_events
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        rec = init_recurrent()
        snap_loader = iter(
            DGDataLoader(train_snap, args.snapshot_ticks, batch_unit="s",
                         materialize_features=False)
        )
        sbatch = next(snap_loader)
        z, rec = snapshot_step(rec, sbatch)
        snap_end = int(np.asarray(sbatch.edge_time).max())

        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                total += float(train_step(z, batch))
                nb += 1
                t_max = int(np.asarray(batch.edge_time).max())
                while t_max > (snap_end + 1) * conversion:
                    try:
                        sbatch = next(snap_loader)
                        z, rec = snapshot_step(rec, sbatch)
                        snap_end = int(np.asarray(sbatch.edge_time).max())
                    except StopIteration:
                        break
        dt = time.perf_counter() - t0
        print(f"epoch={epoch} loss={total / max(nb, 1):.4f} train_edges/s={n_edges / dt:.0f}")
