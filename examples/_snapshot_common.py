"""Shared scaffolding for snapshot (DTDG) link-prediction examples.

Mirrors the reference's snapshot flow (/root/reference/examples/linkproppred/
gclstm.py:187-208): a discretized snapshot loader advances the recurrent
state while an event loader drives prediction batches; BPTT truncates at
snapshot boundaries.

Two execution modes share the same functional cores:

* **scanned** (default) — the two-loader interleave is precomputed on host
  (``tgm_tpu.train.snapshot.merged_snapshot_schedule``) and the whole epoch
  runs as ONE jitted ``lax.scan`` with a ``lax.cond`` body: zero host
  dispatch per step.
* **eager** (``--eager``) — per-batch host loop through ``DGDataLoader``,
  the reference's execution shape.
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
    """Eager epochs of (snapshot-advance, predict) with truncation.

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


def run_snapshot_linkpred(
    args,
    train_data,
    num_nodes: int,
    snap_apply: Callable[[Any, Any, Any], Any],
    init_rec: Callable[[], Any],
    decoder,
    opt,
    params,
    val_data=None,
    test_data=None,
    val_cands=None,
    test_cands=None,
):
    """Train (and optionally evaluate) a snapshot link-prediction model.

    ``snap_apply(params, rec, sbatch) -> (z, rec)`` is the model's pure
    snapshot advance (it must ``stop_gradient`` its outputs — BPTT truncates
    at snapshot boundaries, as in the reference examples); ``decoder`` scores
    (z_src, z_dst) pairs; the BCE-with-random-negatives loss is shared by all
    snapshot examples (/root/reference/examples/linkproppred/gclstm.py:57-96).

    With ``val_data``/``test_data`` + per-edge candidate arrays
    ``(E_split, Q)``, each epoch evaluates val MRR (recurrent state continuing
    from training, first eval snapshot consumed un-applied — reference eval
    semantics) and re-evaluates test on val improvement
    (/root/reference/examples/linkproppred/gclstm.py:223-265). The eager mode
    (``--eager``) covers training only.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.eval.metrics import mrr_sum_count
    from tgm_tpu.train import DeviceEdgeStream, DeviceEventStream
    from tgm_tpu.train.snapshot import (
        merged_snapshot_schedule,
        plan_edge_max_times,
        scanned_snapshot_epoch,
    )

    coarse = TimeDeltaDG("s", args.snapshot_ticks)
    snap_data = train_data.discretize(coarse)
    train_dg = DGraph(train_data)
    dst = train_dg.edge_dst
    neg_hook = RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max()))
    safe = lambda ids: jnp.clip(ids, 0, num_nodes - 1)

    # The epoch functions donate the carry; copy the caller's params so the
    # caller's pytree stays valid (and reusable across runs/modes).
    params = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    opt_state = opt.init(params)

    def train_core(carry, batch, idx):
        params, opt_state, rec, z, hstate = carry
        hstate, batch = neg_hook.apply(hstate, batch)

        def loss_fn(p):
            pos = decoder.apply(p["dec"], z[safe(batch.edge_src)], z[safe(batch.edge_dst)])
            neg = decoder.apply(p["dec"], z[safe(batch.edge_src)], z[safe(batch.neg)])
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rec, z, hstate), (loss, jnp.float32(1.0))

    def snapshot_core(carry, sbatch):
        params, opt_state, rec, z, hstate = carry
        z, rec = snap_apply(params, rec, sbatch)
        return (params, opt_state, rec, z, hstate)

    def fresh_rec_z():
        # De-alias every leaf: examples may alias buffers inside the initial
        # recurrent state (e.g. GCLSTM's (H, C) = (z0, z0)), and the epoch
        # functions donate the carry — the same buffer may not be donated
        # twice, nor reused after donation.
        rec = jax.tree.map(lambda a: jnp.array(a, copy=True), init_rec())
        return rec, jnp.zeros((num_nodes, args.embed_dim))

    rec0, z0 = fresh_rec_z()
    carry = (params, opt_state, rec0, z0, neg_hook.init_state(train_dg))
    n_edges = train_dg.num_edge_events

    if getattr(args, "eager", False):
        snap_jit = jax.jit(snapshot_core)
        train_jit = jax.jit(
            lambda c, b: train_core(c, b, 0), donate_argnums=(0,)
        )
        conversion = args.snapshot_ticks
        for epoch in range(args.epochs):
            t0 = time.perf_counter()
            params, opt_state, _, _, hstate = carry
            rec, z = fresh_rec_z()
            carry = (params, opt_state, rec, z, hstate)
            snap_loader = iter(
                DGDataLoader(DGraph(snap_data), args.snapshot_ticks,
                             batch_unit="s", materialize_features=False)
            )
            sbatch = next(snap_loader)
            carry = snap_jit(carry, sbatch)
            snap_end = int(np.asarray(sbatch.edge_time).max())
            total, nb = 0.0, 0
            for batch in DGDataLoader(train_dg, args.bsize):
                carry, (loss, _) = train_jit(carry, batch)
                total += float(loss)
                nb += 1
                t_max = int(np.asarray(batch.edge_time).max())
                while t_max > (snap_end + 1) * conversion:
                    try:
                        sbatch = next(snap_loader)
                        carry = snap_jit(carry, sbatch)
                        snap_end = int(np.asarray(sbatch.edge_time).max())
                    except StopIteration:
                        break
            dt = time.perf_counter() - t0
            print(f"epoch={epoch} loss={total / max(nb, 1):.4f} "
                  f"train_edges/s={n_edges / dt:.0f}")
        return carry

    # Scanned mode: precompute the merged two-loader schedule on host, then
    # run the whole epoch as one XLA program.
    def build_epoch(split_data, edge_core, apply_first):
        sd = split_data.discretize(coarse)
        dg = DGraph(split_data)
        snap_stream = DeviceEventStream(
            DGDataLoader(DGraph(sd), args.snapshot_ticks, batch_unit="s",
                         materialize_features=False),
            include_features=False,
        )
        edge_stream = DeviceEdgeStream(dg, args.bsize, include_features=False)
        snap_max = plan_edge_max_times(snap_stream._plan, sd.time[sd.edge_mask])
        _, _, t_host = dg._storage.get_edges(dg._slice)
        E, B = len(t_host), args.bsize
        ends = np.minimum((np.arange(edge_stream.num_batches) + 1) * B, E) - 1
        batch_max = np.asarray(t_host)[ends]
        kinds, idxs = merged_snapshot_schedule(
            snap_max, batch_max, args.snapshot_ticks, apply_first=apply_first
        )
        return scanned_snapshot_epoch(
            kinds, idxs, snap_stream.batch_at, edge_stream.batch_at,
            snapshot_core, edge_core, donate_carry=False,
        ), edge_stream.num_batches

    def make_eval_core(cands: np.ndarray, nb: int):
        B = args.bsize
        Q = cands.shape[1]
        padded = np.full((nb * B, Q), PADDED_NODE_ID, np.int32)
        padded[: len(cands)] = cands
        cands_d = jnp.asarray(padded)

        def eval_core(carry, batch, idx):
            params, _, _, z, _ = carry
            rows = lax.dynamic_slice(cands_d, (idx * B, 0), (B, Q))
            pos = decoder.apply(params["dec"], z[safe(batch.edge_src)], z[safe(batch.edge_dst)])
            zc = z[safe(rows.reshape(-1))]
            zs = jnp.repeat(z[safe(batch.edge_src)][:, None, :], Q, axis=1)
            negs = decoder.apply(
                params["dec"], zs.reshape(B * Q, -1), zc
            ).reshape(B, Q)
            s, c = mrr_sum_count(
                pos, negs, neg_valid=rows != PADDED_NODE_ID,
                edge_valid=batch.edge_valid,
            )
            return carry, (s, c)

        return eval_core

    train_epoch, _ = build_epoch(train_data, train_core, apply_first=True)
    val_epoch = test_epoch = None
    if val_data is not None and val_cands is not None:
        nb_v = max(1, -(-val_data.edge_index.shape[0] // args.bsize))
        val_epoch, _ = build_epoch(
            val_data, make_eval_core(val_cands, nb_v), apply_first=False
        )
    if test_data is not None and test_cands is not None:
        nb_t = max(1, -(-test_data.edge_index.shape[0] // args.bsize))
        test_epoch, _ = build_epoch(
            test_data, make_eval_core(test_cands, nb_t), apply_first=False
        )

    def ratio(a, b):
        return float(np.sum(np.asarray(a)) / max(float(np.sum(np.asarray(b))), 1.0))

    best_val, test_mrr = 0.0, 0.0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        params, opt_state, _, _, hstate = carry
        rec, z = fresh_rec_z()
        carry = (params, opt_state, rec, z, hstate)
        carry, losses, counts = train_epoch(carry)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        line = f"epoch={epoch} loss={ratio(losses, counts):.4f} train_edges/s={n_edges / dt:.0f}"
        if val_epoch is not None:
            carry, s, c = val_epoch(carry)
            val_mrr = ratio(s, c)
            line += f" val_mrr={val_mrr:.4f}"
            if test_epoch is not None and val_mrr > best_val:
                best_val = val_mrr
                carry, s, c = test_epoch(carry)
                test_mrr = ratio(s, c)
        print(line)
    if test_epoch is not None:
        print(f"test_mrr={test_mrr:.4f}")
    return carry
