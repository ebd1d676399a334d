"""Temporal-axis parallelism: sharding the event stream across devices.

The TPU analog of sequence parallelism for temporal GNNs (SURVEY.md §5
"long-context"): the time-sorted edge stream is split into contiguous spans,
one per device. Carried state (TGN memory, recency buffers) makes the stream
fundamentally sequential, so two execution modes are provided:

* ``chain`` — exact: spans run in sequence, each consuming the previous
  span's final state. No wall-clock speedup on one program, but it is the
  correctness baseline and the memory-scaling story (each host only holds
  its span's events).
* ``stale`` — DistTGL-style relaxed staleness: all spans run in parallel
  from the epoch-start state (bounded staleness = one span), then states are
  merged **owner-wise**: each node row is taken from the span that last
  touched it (max ``last_update`` for TGN memory, max write count for
  recency buffers); parameters are averaged (local-SGD style). MRR impact of
  the staleness must be quantified per dataset (reference has no counterpart
  to compare against — this is a new capability).

Both modes build on ``TGNPipeline.train_step`` and a per-span
``DeviceEdgeStream``-style batch slicer.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..train.tgn_pipeline import TGNCarry


def split_spans(num_batches: int, n_spans: int) -> List[Tuple[int, int]]:
    """Contiguous [start, end) batch-index spans, balanced within ±1."""
    base = num_batches // n_spans
    rem = num_batches % n_spans
    spans, start = [], 0
    for i in range(n_spans):
        size = base + (1 if i < rem else 0)
        spans.append((start, start + size))
        start += size
    return spans


def chain_epoch(step_fn, batch_at, carry, num_batches: int, n_spans: int):
    """Exact sequential execution over spans (state handed off at boundaries).

    Returns (final_carry, per-batch losses). Functionally identical to one
    scan over the epoch; the span structure is the unit of placement for
    multi-host runs (each host scans its own span).
    """
    losses = []
    for start, end in split_spans(num_batches, n_spans):
        if end <= start:
            continue

        def body(c, i):
            return step_fn(c, batch_at(i))

        carry, span_losses = jax.lax.scan(
            body, carry, jnp.arange(start, end)
        )
        losses.append(span_losses)
    return carry, jnp.concatenate(losses) if losses else jnp.zeros((0,))


def _stale_span_range(step_fn, batch_at, carry, start: int, end: int,
                      n_spans: int, num_batches: int,
                      carry_stacked: bool = False):
    """Run batches [start, end) as ``n_spans`` parallel spans from ``carry``
    (one shared carry, or per-span carries when ``carry_stacked``).

    Returns (per-span final carries stacked on axis 0, losses (spans, L)).
    """
    spans = [(start + s, start + e) for s, e in split_spans(end - start, n_spans)]
    span_len = max(e - s for s, e in spans)
    # Spans are padded to equal length, but padded iterations are SKIPPED via
    # lax.cond (carry passes through unchanged, loss slot = 0) — no repeated
    # batches ever execute, so training statistics are unaffected. Callers
    # averaging the loss array should mask the zero slots of shorter spans.
    starts = jnp.asarray([s for s, _ in spans])
    lens = jnp.asarray([e - s for s, e in spans])

    def run_span(s0, length, c0):
        def body(c, j):
            i = jnp.minimum(s0 + j, num_batches - 1)

            def do(c):
                return step_fn(c, batch_at(i))

            def skip(c):
                return c, jnp.float32(0)

            return jax.lax.cond(j < length, do, skip, c)

        return jax.lax.scan(body, c0, jnp.arange(span_len))

    return jax.vmap(run_span, in_axes=(0, 0, 0 if carry_stacked else None))(
        starts, lens, carry
    )


def stale_parallel_epoch(
    step_fn,
    batch_at,
    carry: TGNCarry,
    num_batches: int,
    n_spans: int,
):
    """Run all spans in parallel from the same starting state (vmap over the
    span axis; under a mesh the span axis shards across devices).

    Returns (per-span final carries stacked on axis 0, losses (spans, L)).
    Use :func:`merge_stale_carries` to collapse the span axis.
    """
    return _stale_span_range(step_fn, batch_at, carry, 0, num_batches,
                             n_spans, num_batches)


def _broadcast_state(tree, n_spans: int):
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n_spans,) + a.shape), tree
    )


def stale_resync_epoch(
    step_fn,
    batch_at,
    carry: TGNCarry,
    num_batches: int,
    n_spans: int,
    num_nodes: int,
    resync_rounds: int,
    merge_params_each_round: bool = True,
):
    """Bounded staleness with periodic resync: the epoch runs as
    ``resync_rounds`` rounds; each round executes its batch range as
    ``n_spans`` parallel spans from the round-start state, then merges
    owner-wise (:func:`merge_stale_carries`). The staleness window shrinks
    from ``num_batches / n_spans`` (one merge per epoch) to
    ``num_batches / (resync_rounds * n_spans)`` at the cost of
    ``resync_rounds`` cheap merges (argmax + row gathers + parameter mean) —
    on a mesh each merge is one all-reduce-sized collective, so wall-clock
    parallelism across spans is preserved.

    ``merge_params_each_round=False`` resyncs only the carried STATE (memory
    + recency buffers) each round; parameters/optimizer moments stay
    per-span (local-SGD flavored) and are averaged once at the epoch end —
    the ablation separating state-staleness cost from the cost of averaging
    diverged Adam trajectories mid-epoch.

    Returns (final carry, list of per-round (spans, L) loss arrays). With
    ``resync_rounds == 1`` this is exactly ``stale_parallel_epoch`` + one
    merge; as ``resync_rounds -> num_batches / n_spans`` it approaches the
    exact sequential schedule.
    """
    all_losses = []
    stacked = None
    merged = carry
    for rs, re in split_spans(num_batches, resync_rounds):
        if re <= rs:
            continue
        carries, losses = _stale_span_range(
            step_fn, batch_at, stacked if stacked is not None else merged,
            rs, re, n_spans, num_batches, carry_stacked=stacked is not None,
        )
        merged = merge_stale_carries(carries, num_nodes)
        if not merge_params_each_round:
            # Broadcast the merged state into every span; keep per-span
            # params/opt/rng.
            stacked = carries._replace(
                mem_state=_broadcast_state(merged.mem_state, n_spans),
                rec_state=_broadcast_state(merged.rec_state, n_spans),
            )
        all_losses.append(losses)
    return merged, all_losses


def pipelined_eval_epoch(
    advance_fn,
    score_fn,
    carry,
    num_batches: int,
    n_spans: int,
):
    """EXACT temporal-parallel evaluation via pipelined span handoff.

    Unlike training — where the parameter/optimizer chain makes every batch
    depend on ALL previous batches, so any span overlap changes the
    trajectory (see STALENESS.md) — evaluation splits cleanly:

    * state evolution (memory commit + recency buffers) chains batch to
      batch but is CHEAP and score-independent;
    * candidate scoring is EXPENSIVE ((B·Q) encoder forwards per batch) and
      feeds nothing back into the state.

    So span d can start scoring the moment the cheap state chain hands it
    span d−1's boundary state, overlapping all downstream scoring:

    * phase A (sequential prologue): scan ``advance_fn`` over spans
      0..n−2, recording each span's start carry — the "handoff" states;
    * phase B (parallel): every span runs the full ``score_fn`` scan from
      its start carry (the state advance is recomputed inside the span —
      recompute beats waiting). Under a mesh the stacked span axis shards
      across devices; on one device XLA still overlaps the independent
      span programs' scoring.

    Ideal wall-clock: ``T_advance·(n−1)/n + T_full/n`` vs ``T_full`` for
    the chain schedule — measured T_advance/T_full on v5e gives the overlap
    fraction (STALENESS.md round-4 section).

    ``advance_fn(carry, i) -> carry`` must advance state EXACTLY as
    ``score_fn(carry, i) -> (carry, out)`` does (e.g.
    ``TGNPipeline.eval_advance_state`` vs ``eval_step``); outputs are then
    bit-identical to the sequential scan
    (tests/test_temporal_parallel.py::test_pipelined_eval_exact).

    Returns (per-span outs stacked (spans, span_len, ...), valid mask
    (spans, span_len)). Padded slots of shorter spans are zeros.
    """
    spans = split_spans(num_batches, n_spans)
    starts = [carry]
    c = carry
    for s, e in spans[:-1]:
        def body(cc, i):
            return advance_fn(cc, i), jnp.float32(0)

        c, _ = jax.lax.scan(body, c, jnp.arange(s, e))
        starts.append(c)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *starts)

    span_len = max(e - s for s, e in spans)
    s0 = jnp.asarray([s for s, _ in spans])
    lens = jnp.asarray([e - s for s, e in spans])

    def run_span(start, length, c0):
        def body(cc, j):
            i = jnp.minimum(start + j, num_batches - 1)

            def do(cc):
                return score_fn(cc, i)

            def skip(cc):
                _, out_shape = jax.eval_shape(score_fn, cc, i)
                zeros = jax.tree_util.tree_map(
                    lambda sh: jnp.zeros(sh.shape, sh.dtype), out_shape
                )
                return cc, zeros

            return jax.lax.cond(j < length, do, skip, cc)

        _, outs = jax.lax.scan(body, c0, jnp.arange(span_len))
        return outs

    outs = jax.vmap(run_span)(s0, lens, stacked)
    valid = jnp.arange(span_len)[None, :] < lens[:, None]
    return outs, valid


def merge_stale_carries(carries: TGNCarry, num_nodes: int) -> TGNCarry:
    """Collapse the span axis: owner-wise state merge + parameter average.

    Each node row of the memory/recency state is taken from the span with
    the most recent activity for that node; parameters and optimizer moments
    are averaged across spans.
    """
    mem = carries.mem_state
    # Winner span per node: max last_update (ties -> later span).
    n_spans = mem.last_update.shape[0]
    span_ids = jnp.arange(n_spans)[:, None]
    key = mem.last_update * n_spans + span_ids  # later span wins ties
    winner_mem = jnp.argmax(key, axis=0)  # (N_pad,)

    def pick_rows(arr, winner):
        # arr: (spans, N_pad, ...); winner: (N_pad,)
        return arr[winner, jnp.arange(arr.shape[1])]

    mem_merged = jax.tree_util.tree_map(lambda a: pick_rows(a, winner_mem), mem)

    rec = carries.rec_state
    write_pos = rec[3]  # (spans, N_pad)
    key_r = write_pos * n_spans + span_ids
    winner_rec = jnp.argmax(key_r, axis=0)
    rec_merged = tuple(pick_rows(a, winner_rec) for a in rec)

    mean = lambda a: jnp.mean(a, axis=0) if jnp.issubdtype(a.dtype, jnp.floating) else a[0]
    params = jax.tree_util.tree_map(mean, carries.params)
    opt_state = jax.tree_util.tree_map(mean, carries.opt_state)
    return TGNCarry(params, opt_state, mem_merged, rec_merged, carries.rng[0])
