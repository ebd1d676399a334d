"""Deeper test tiers from VERDICT r1 §"Next round" item 10.

* time-unit snapshot iteration feeding a snapshot encoder end-to-end;
* eval-MRR golden value through TGBNegativeEdgeSamplerHook (hand-computed);
* DeduplicationHook at exact capacity / with out-of-range ids;
* TGB candidate cursor alignment with a partial tail batch and an empty
  mid-split batch (regression for the clamped-cursor misalignment).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu import DGData, DGDataLoader, DGraph, PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_sum_count
from tgm_tpu.hooks import DeduplicationHook, HookManager, TGBNegativeEdgeSamplerHook


# --------------------------------------------------------------------- #
# Time-unit snapshot iteration -> snapshot encoder end-to-end
# --------------------------------------------------------------------- #
def test_time_unit_snapshot_iteration_feeds_tgcn():
    from tgm_tpu.nn.encoder.tgcn import TGCN

    rng = np.random.default_rng(0)
    N, E = 20, 120
    # 6 days of events, seconds resolution.
    t = np.sort(rng.integers(0, 6 * 86_400, E))
    data = DGData.from_raw(
        edge_time=t, edge_index=rng.integers(0, N, (E, 2)), time_delta="s"
    )
    disc = data.discretize("D")
    dg = DGraph(disc)
    loader = DGDataLoader(dg, batch_size=1, batch_unit="D")

    model = TGCN(in_channels=4, out_channels=8)
    x = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    params = None
    H = None
    n_snapshots = 0
    for batch in loader:
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0), x, batch.edge_src, batch.edge_dst,
                None, None, batch.edge_valid,
            )
        H = model.apply(
            params, x, batch.edge_src, batch.edge_dst, None, H, batch.edge_valid
        )
        n_snapshots += 1
        assert np.isfinite(np.asarray(H)).all()
    # One snapshot per populated day.
    days = len(np.unique(t // 86_400))
    assert n_snapshots == days
    assert H.shape == (N, 8)


# --------------------------------------------------------------------- #
# Golden-value eval MRR through the TGB hook
# --------------------------------------------------------------------- #
def test_eval_mrr_golden_value_through_tgb_hook():
    """Score every node by -id (higher id = lower score) so ranks are exact:
    rank of dst among candidates = 1 + #candidates with smaller id."""
    E, Q, N = 6, 3, 40
    src = np.arange(E) % 5
    dst = np.array([10, 20, 5, 30, 15, 25])
    t = np.arange(1, E + 1)
    data = DGData.from_raw(
        edge_time=t, edge_index=np.stack([src, dst], 1), time_delta="s"
    )
    dg = DGraph(data)
    cands = np.array([
        [11, 12, 13],   # all > 10  -> pos rank 1
        [1, 2, 3],      # all < 20  -> rank 4
        [4, 6, 7],      # one below -> rank 2
        [29, 31, 33],   # one below... 29<30 -> rank 2
        [15, 15, 15],   # exact ties -> rank 1 + 3*0.5 = 2.5
        [24, 26, 28],   # 24<25 -> rank 2
    ])
    expected_rr = np.array([1.0, 1 / 4, 1 / 2, 1 / 2, 1 / 2.5, 1 / 2])

    hm = HookManager(keys=["val"])
    hm.register("val", TGBNegativeEdgeSamplerHook(candidates=cands))
    loader = DGDataLoader(dg, 3, hook_manager=hm, pad_multiple=1)

    s_total, c_total = 0.0, 0.0
    with hm.activate("val"):
        for batch in loader:
            pos_score = -batch.edge_dst.astype(jnp.float32)
            neg_score = -batch.neg_batch_list.astype(jnp.float32)
            s, c = mrr_sum_count(
                pos_score, neg_score,
                neg_valid=batch.neg_batch_list != PADDED_NODE_ID,
                edge_valid=batch.edge_valid,
            )
            s_total += float(s)
            c_total += float(c)
    np.testing.assert_allclose(s_total / c_total, expected_rr.mean(), rtol=1e-6)


# --------------------------------------------------------------------- #
# Dedup at capacity / out-of-range ids
# --------------------------------------------------------------------- #
def test_dedup_exact_capacity_no_padding():
    """All-distinct ids fill the capacity exactly; mapping must be complete."""
    N = 16
    h = DeduplicationHook(N)
    data = DGData.from_raw(
        edge_time=np.arange(1, 9),
        edge_index=np.stack([np.arange(8), np.arange(8, 16)], 1),
        time_delta="s",
    )
    dg = DGraph(data)
    b = dg.materialize()
    b = h(dg, b)
    uniq = np.asarray(b.unique_nids)
    assert int(b.num_unique) == 16
    assert not np.any(uniq == PADDED_NODE_ID)
    np.testing.assert_array_equal(np.sort(uniq), np.arange(16))
    g2l = np.asarray(b.global_to_local)
    for gid in range(16):
        assert uniq[g2l[gid]] == gid


def test_dedup_out_of_range_ids_excluded():
    """Ids >= num_nodes and PADDED ids never enter the unique set and map to -1."""
    N = 8
    h = DeduplicationHook(N, seed_nodes_keys=["extra"])
    data = DGData.from_raw(
        edge_time=np.array([1, 2]),
        edge_index=np.array([[0, 1], [2, 3]]),
        time_delta="s",
    )
    dg = DGraph(data)
    b = dg.materialize()
    b.extra = jnp.asarray([5, 200, PADDED_NODE_ID, 7], jnp.int32)
    b = h(dg, b)
    uniq = np.asarray(b.unique_nids)
    valid = uniq[uniq != PADDED_NODE_ID]
    np.testing.assert_array_equal(np.sort(valid), [0, 1, 2, 3, 5, 7])
    g2l = np.asarray(b.global_to_local)
    assert g2l[-1] == -1  # the PAD slot
    # 200 is out of range: map_to_local routes it through the PAD slot.
    from tgm_tpu.hooks import map_to_local

    got = np.asarray(map_to_local(b.global_to_local, jnp.asarray([200, 6])))
    assert got[0] == -1  # out of range
    assert got[1] == -1  # in range but absent from the batch


# --------------------------------------------------------------------- #
# TGB cursor alignment: partial tail + empty mid-split batch
# --------------------------------------------------------------------- #
def test_tgb_cursor_partial_tail_alignment():
    """10 eval edges, bsize 4 -> batches of 4/4/2 valid rows. The tail batch
    must serve candidate rows 8..9 (the clamped-cursor bug re-served 6..7)."""
    E, Q = 10, 2
    cands = np.arange(E * Q).reshape(E, Q)
    data = DGData.from_raw(
        edge_time=np.arange(1, E + 1),
        edge_index=np.stack([np.zeros(E, np.int64), np.arange(1, E + 1)], 1),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["val"])
    hm.register("val", TGBNegativeEdgeSamplerHook(candidates=cands))
    loader = DGDataLoader(dg, 4, hook_manager=hm, pad_multiple=1)

    seen = []
    with hm.activate("val"):
        for batch in loader:
            nv = int(np.asarray(batch.edge_valid).sum())
            seen.append(np.asarray(batch.neg_batch_list)[:nv])
    np.testing.assert_array_equal(np.concatenate(seen), cands)
    # Invalid tail rows are padded.
    assert np.all(
        np.asarray(batch.neg_batch_list)[nv:] == PADDED_NODE_ID
    )


def test_tgb_cursor_with_empty_mid_batch():
    """A time gap creates an empty (skipped) time-ordered batch mid-split;
    the cursor must not advance for it."""
    # Edges at t in [0,10) and [20,30): batch_unit windows of 10 -> the middle
    # window [10, 20) is empty and skipped.
    t = np.array([1, 3, 5, 21, 23, 25])
    E, Q = len(t), 2
    cands = np.arange(E * Q).reshape(E, Q)
    data = DGData.from_raw(
        edge_time=t,
        edge_index=np.stack([np.zeros(E, np.int64), np.arange(1, E + 1)], 1),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["val"])
    hm.register("val", TGBNegativeEdgeSamplerHook(candidates=cands))
    loader = DGDataLoader(dg, 10, batch_unit="s", hook_manager=hm, pad_multiple=1)

    seen = []
    with hm.activate("val"):
        for batch in loader:
            nv = int(np.asarray(batch.edge_valid).sum())
            seen.append(np.asarray(batch.neg_batch_list)[:nv])
    assert len(seen) == 2  # empty middle window skipped
    np.testing.assert_array_equal(np.concatenate(seen), cands)
