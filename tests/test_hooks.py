import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph, PADDED_NODE_ID
from tgm_tpu.hooks import (
    DeduplicationHook,
    EdgeEventsSeenNodesTrackHook,
    HistoricalNegativeEdgeSamplerHook,
    HookManager,
    NeighborSamplerHook,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
    TGBNegativeEdgeSamplerHook,
    map_to_local,
)
from tgm_tpu.hooks.neighbors import recency_init, recency_query, recency_update


@pytest.fixture
def dg(tiny_events):
    edge_time, edge_index, edge_x = tiny_events
    return DGraph(DGData.from_raw(edge_time=edge_time, edge_index=edge_index, edge_x=edge_x))


def materialize(dg, **kw):
    return dg.materialize(**kw)


# ------------------------------------------------------------------ #
# Random negatives
# ------------------------------------------------------------------ #
def test_random_negatives(dg):
    h = RandomNegativeEdgeSamplerHook(low=0, high=4)
    b = h(dg, materialize(dg))
    assert b.neg.shape == b.edge_dst.shape
    assert int(b.neg.min()) >= 0 and int(b.neg.max()) < 4
    np.testing.assert_array_equal(np.asarray(b.neg_time), np.asarray(b.edge_time))


def test_random_negatives_validation():
    with pytest.raises(ValueError):
        RandomNegativeEdgeSamplerHook(low=5, high=5)
    with pytest.raises(ValueError):
        RandomNegativeEdgeSamplerHook(low=0, high=4, neg_ratio=0)


def test_random_negatives_reproducible(dg):
    from tgm_tpu.util.seed import seed_everything

    seed_everything(7)
    h1 = RandomNegativeEdgeSamplerHook(low=0, high=100)
    b1 = h1(dg, materialize(dg))
    seed_everything(7)
    h2 = RandomNegativeEdgeSamplerHook(low=0, high=100)
    b2 = h2(dg, materialize(dg))
    np.testing.assert_array_equal(np.asarray(b1.neg), np.asarray(b2.neg))


# ------------------------------------------------------------------ #
# Historical negatives
# ------------------------------------------------------------------ #
def test_historical_negatives(dg):
    h = HistoricalNegativeEdgeSamplerHook()
    b1 = h(dg, materialize(dg.slice_events(0, 4)))
    # First batch: no history yet
    assert np.all(np.asarray(b1.neg) == PADDED_NODE_ID)
    assert not np.any(np.asarray(b1.valid_neg_mask))

    b2 = h(dg, materialize(dg.slice_events(4, 8)))
    # Batch 2 edges: (1,3)@5 (0,2)@8 (2,1)@9 (3,1)@20. History: 0-1,1-2,2-3,3-0
    neg = np.asarray(b2.neg)
    valid = np.asarray(b2.valid_neg_mask)
    assert valid.all()  # all srcs have history
    # src=1 history dsts: {2} (directed src->dst log) => neg must be 2
    assert neg[0] == 2


def test_historical_negatives_reset(dg):
    h = HistoricalNegativeEdgeSamplerHook()
    h(dg, materialize(dg))
    assert h.state is not None
    h.reset_state()
    assert h.state is None


# ------------------------------------------------------------------ #
# TGB eval negatives
# ------------------------------------------------------------------ #
def test_tgb_negatives_from_arrays(dg):
    E, Q = 8, 3
    cands = np.arange(E * Q).reshape(E, Q) % 4
    h = TGBNegativeEdgeSamplerHook(candidates=cands)
    b1 = h(dg, materialize(dg.slice_events(0, 4)))
    np.testing.assert_array_equal(np.asarray(b1.neg_batch_list), cands[:4])
    b2 = h(dg, materialize(dg.slice_events(4, 8)))
    np.testing.assert_array_equal(np.asarray(b2.neg_batch_list), cands[4:])
    # ``neg`` is the unique candidate set (reference tgb_sampler.py:113),
    # sorted ascending, padded with PADDED_NODE_ID to static capacity B*Q.
    assert b2.neg.shape == (4 * Q,)
    got = np.asarray(b2.neg)
    expect = np.unique(cands[4:])
    np.testing.assert_array_equal(got[: len(expect)], expect)
    assert np.all(got[len(expect) :] == PADDED_NODE_ID)
    assert b2.neg_time.shape == (4 * Q,)


# ------------------------------------------------------------------ #
# Recency buffers: functional core
# ------------------------------------------------------------------ #
def test_recency_query_empty():
    state = recency_init(num_nodes=4, buf_size=3, edge_dim=2)
    nbrs, times, feats = recency_query(state, jnp.array([0, 1]), jnp.array([10, 10]), 2)
    assert np.all(np.asarray(nbrs) == PADDED_NODE_ID)
    assert np.all(np.asarray(times) == 0)
    assert np.all(np.asarray(feats) == 0)


def test_recency_update_then_query():
    state = recency_init(num_nodes=4, buf_size=3, edge_dim=1)
    src = jnp.array([0, 1, 0])
    dst = jnp.array([1, 2, 3])
    t = jnp.array([1, 2, 3])
    x = jnp.array([[10.0], [20.0], [30.0]])
    state = recency_update(state, src, dst, t, x, None, directed=False)

    # node 0 interacted with 1@1 and 3@3
    nbrs, times, feats = recency_query(state, jnp.array([0]), jnp.array([10]), 2)
    np.testing.assert_array_equal(np.asarray(nbrs)[0], [1, 3])
    np.testing.assert_array_equal(np.asarray(times)[0], [1, 3])
    np.testing.assert_array_equal(np.asarray(feats)[0, :, 0], [10.0, 30.0])

    # time constraint: strictly before t=3 -> only neighbor 1@1, right-aligned
    nbrs, times, _ = recency_query(state, jnp.array([0]), jnp.array([3]), 2)
    np.testing.assert_array_equal(np.asarray(nbrs)[0], [PADDED_NODE_ID, 1])
    np.testing.assert_array_equal(np.asarray(times)[0], [0, 1])


def test_recency_buffer_eviction():
    # buffer size 2: pushing 3 events to node 0 keeps the 2 most recent
    state = recency_init(num_nodes=4, buf_size=2, edge_dim=1)
    src = jnp.array([0, 0, 0])
    dst = jnp.array([1, 2, 3])
    t = jnp.array([1, 2, 3])
    x = jnp.array([[1.0], [2.0], [3.0]])
    state = recency_update(state, src, dst, t, x, None, directed=True)
    nbrs, times, _ = recency_query(state, jnp.array([0]), jnp.array([99]), 2)
    np.testing.assert_array_equal(np.asarray(nbrs)[0], [2, 3])
    np.testing.assert_array_equal(np.asarray(times)[0], [2, 3])


def test_recency_update_respects_valid_mask():
    state = recency_init(num_nodes=4, buf_size=2, edge_dim=1)
    src = jnp.array([0, 0])
    dst = jnp.array([1, 2])
    t = jnp.array([1, 2])
    x = jnp.ones((2, 1))
    valid = jnp.array([True, False])
    state = recency_update(state, src, dst, t, x, valid, directed=True)
    nbrs, _, _ = recency_query(state, jnp.array([0]), jnp.array([99]), 2)
    np.testing.assert_array_equal(np.asarray(nbrs)[0], [PADDED_NODE_ID, 1])


def test_recency_wraparound_ordering():
    # Fill buffer over multiple updates; verify chronological window after wrap.
    state = recency_init(num_nodes=2, buf_size=3, edge_dim=1)
    for i in range(5):  # node 0 gets neighbors 10+i at t=i+1
        state = recency_update(
            state,
            jnp.array([0]),
            jnp.array([10 + i]) % 2 + 0 * jnp.array([1]),  # neighbor id in range
            jnp.array([i + 1]),
            jnp.ones((1, 1)) * i,
            None,
            directed=True,
        )
    nbrs, times, _ = recency_query(state, jnp.array([0]), jnp.array([99]), 3)
    np.testing.assert_array_equal(np.asarray(times)[0], [3, 4, 5])


# ------------------------------------------------------------------ #
# Recency hook end-to-end
# ------------------------------------------------------------------ #
def test_recency_hook_multihop(dg):
    h = RecencyNeighborHook(
        num_nodes=4,
        num_nbrs=[2, 2],
        seed_nodes_keys=["edge_src", "edge_dst"],
        seed_times_keys=["edge_time", "edge_time"],
    )
    loader = DGDataLoader(dg, batch_size=4, hook_manager=None, pad_multiple=1)
    batches = []
    for b in loader:
        batches.append(h(dg, b))
    b2 = batches[1]
    assert len(b2.nbr_nids) == 2  # two hops
    S = b2.seed_nids[0].shape[0]
    assert b2.nbr_nids[0].shape == (S, 2)
    assert b2.nbr_nids[1].shape == (S * 2, 2)
    # Batch2 edges @5,5,8,9; batch1 pushed edges @1,1,2,5.
    # seed edge_src[0] = 1 @ t=5: recent nbrs strictly before 5: 0@1, 2@1
    nbrs0 = np.asarray(b2.nbr_nids[0])[0]
    assert set(nbrs0.tolist()) == {0, 2}
    # seed mask maps names to index ranges
    assert np.asarray(b2.seed_node_nbr_mask["edge_src"]).tolist() == list(range(4))


def test_recency_hook_validation():
    with pytest.raises(ValueError):
        RecencyNeighborHook(4, [], ["edge_src"], ["edge_time"])
    with pytest.raises(ValueError):
        RecencyNeighborHook(4, [0], ["edge_src"], ["edge_time"])
    with pytest.raises(ValueError):
        RecencyNeighborHook(4, [2], ["edge_src", "edge_dst"], ["edge_time"])


# ------------------------------------------------------------------ #
# Uniform sampler hook
# ------------------------------------------------------------------ #
def test_uniform_sampler_hook(dg):
    h = NeighborSamplerHook(
        num_nbrs=[5],
        seed_nodes_keys=["edge_src"],
        seed_times_keys=["edge_time"],
    )
    loader = DGDataLoader(dg, batch_size=4, pad_multiple=1)
    batches = list(loader)
    b2 = h(dg, batches[1])
    # batch2 min time = 5; history is everything strictly before 5: edges @1,1,2
    # seed edge_src = [1, 0, 2, 3]; node 1 nbrs before t=5: 0@1, 2@1
    nbrs = np.asarray(b2.nbr_nids[0])
    assert set(nbrs[0][nbrs[0] != PADDED_NODE_ID].tolist()) == {0, 2}
    # node 3's only history before 5 is edge (2,3)@2 -> neighbor 2, left-aligned
    np.testing.assert_array_equal(nbrs[3], [2] + [PADDED_NODE_ID] * 4)


# ------------------------------------------------------------------ #
# Dedup
# ------------------------------------------------------------------ #
def test_dedup_hook(dg):
    h = DeduplicationHook(num_nodes=4)
    b = h(dg, materialize(dg.slice_events(0, 3)))
    uniq = np.asarray(b.unique_nids)
    n = int(b.num_unique)
    assert set(uniq[:n].tolist()) == {0, 1, 2, 3}
    g2l = b.global_to_local
    local_src = np.asarray(map_to_local(g2l, b.edge_src))
    np.testing.assert_array_equal(uniq[local_src], np.asarray(b.edge_src))


def test_dedup_with_neighbors(dg):
    hm = HookManager(keys=["train"])
    hm.register(
        "train",
        RecencyNeighborHook(
            4, [2], ["edge_src", "edge_dst"], ["edge_time", "edge_time"]
        ),
    )
    hm.register("train", DeduplicationHook(num_nodes=4, seed_nodes_keys=["nbr_nids"]))
    loader = DGDataLoader(dg, batch_size=4, hook_manager=hm, pad_multiple=1)
    with hm.activate("train"):
        batches = list(loader)
    b = batches[1]
    n = int(b.num_unique)
    assert n >= 1
    # PADDED fill at the tail
    assert np.all(np.asarray(b.unique_nids)[n:] == PADDED_NODE_ID)


# ------------------------------------------------------------------ #
# Seen-nodes tracking
# ------------------------------------------------------------------ #
def test_seen_nodes_track(tiny_events):
    edge_time, edge_index, edge_x = tiny_events
    data = DGData.from_raw(
        edge_time=edge_time,
        edge_index=edge_index,
        edge_x=edge_x,
        node_y_time=np.array([6, 21]),
        node_y_nids=np.array([1, 3]),
        node_y=np.ones((2, 1), dtype=np.float32),
    )
    dg = DGraph(data)
    h = EdgeEventsSeenNodesTrackHook(num_nodes=4)
    b = h(dg, dg.materialize())
    assert np.asarray(b.batch_nodes_mask).all()  # both labeled nodes seen


def test_hook_state_roundtrip(dg):
    hm = HookManager(keys=["train"])
    rec = RecencyNeighborHook(4, [2], ["edge_src"], ["edge_time"])
    hm.register("train", rec)
    with hm.activate("train"):
        hm.execute_active_hooks(dg, materialize(dg, pad_edges_to=8))
    states = hm.collect_states()
    assert states["keyed"]["train"]
    hm.load_states(states)  # no error


# ------------------------------------------------------------------ #
# Uniform sampler: without-replacement semantics (reference parity)
# ------------------------------------------------------------------ #
def test_uniform_sampler_without_replacement_stats():
    """Oversized neighborhoods (degree > k) must yield k DISTINCT neighbors
    with uniform marginal inclusion, matching the reference's
    np.random.choice(replace=False) (array_backend.py:129-171)."""
    import jax

    from tgm_tpu import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.hooks import NeighborSamplerHook

    # Star graph: node 0 interacts with nodes 1..D at times 1..D.
    D, k = 24, 5
    src = np.zeros(D, np.int64)
    dst = np.arange(1, D + 1, dtype=np.int64)
    t = np.arange(1, D + 1, dtype=np.int64)
    extra_t = np.array([D + 1], np.int64)  # one later edge to query before
    data = DGData.from_raw(
        edge_time=np.concatenate([t, extra_t]),
        edge_index=np.stack(
            [np.concatenate([src, [0]]), np.concatenate([dst, [1]])], 1
        ),
        time_delta="s",
    )
    dg = DGraph(data)
    hook = NeighborSamplerHook([k], ["edge_src"], ["edge_time"])
    hook.init_state(dg)

    counts = np.zeros(D + 2)
    trials = 400
    key = jax.random.PRNGKey(0)
    seeds = jnp.zeros((1,), jnp.int32)  # node 0
    for _ in range(trials):
        key, sub = jax.random.split(key)
        nbrs, _, _ = hook._query(sub, seeds, jnp.asarray(D), k)
        row = np.asarray(nbrs[0])
        assert len(np.unique(row)) == k, f"duplicate neighbors drawn: {row}"
        counts[row] += 1

    # Marginal inclusion probability k/D for every neighbor 1..D.
    freq = counts[1 : D + 1] / trials
    expect = k / D
    assert abs(freq.mean() - expect) < 0.01
    # Each individual neighbor within ~5 sigma of binomial expectation.
    sigma = np.sqrt(expect * (1 - expect) / trials)
    assert np.all(np.abs(freq - expect) < 5 * sigma), freq


def test_dense_push_plan_bit_matches_sort_plan():
    """The sort-free dense push plan (hooks/neighbors.py:_push_plan_dense,
    +6.9% TGN epoch on v5e) must produce bit-identical buffers to the
    stable-lexsort plan across ties, invalid events, both directions, and
    evolved write positions."""
    import tgm_tpu.hooks.neighbors as nb

    rng = np.random.default_rng(7)
    try:
        for _ in range(12):
            N = int(rng.integers(3, 40))
            B = int(rng.integers(1, 8))
            E = int(rng.integers(1, 60))
            directed = bool(rng.integers(0, 2))
            src = jnp.asarray(rng.integers(0, N, E), jnp.int32)
            dst = jnp.asarray(rng.integers(0, N, E), jnp.int32)
            # Small time range => heavy (node, time) ties.
            t = jnp.asarray(np.sort(rng.integers(0, max(2, E // 3), E)), jnp.int32)
            eids = jnp.asarray(rng.integers(0, 1000, E), jnp.int32)
            valid = jnp.asarray(rng.random(E) > 0.2)
            outs = []
            for flag in (False, True):
                nb.USE_DENSE_PUSH = flag
                s = nb.recency_eid_init(N, B)
                for rep in range(3):
                    s = nb.recency_eid_update(
                        s, src, dst, t + rep * 5, eids, valid, directed=directed
                    )
                outs.append([np.asarray(x) for x in s])
            for a, b in zip(*outs):
                np.testing.assert_array_equal(a, b)
    finally:
        nb.USE_DENSE_PUSH = None


def test_packed_recency_matches_eid_layout_both_plans():
    """The packed (N, K, 3) buffer must hold identical (nbr, time, eid)
    triples to the separate-buffer eid layout under BOTH push plans, and
    pk queries must return identical windows."""
    import tgm_tpu.hooks.neighbors as nb

    rng = np.random.default_rng(13)
    try:
        for flag in (False, True):
            nb.USE_DENSE_PUSH = flag
            N, B, E = 25, 5, 40
            src = jnp.asarray(rng.integers(0, N, E), jnp.int32)
            dst = jnp.asarray(rng.integers(0, N, E), jnp.int32)
            t = jnp.asarray(np.sort(rng.integers(0, 15, E)), jnp.int32)
            eids = jnp.asarray(rng.integers(0, 500, E), jnp.int32)
            valid = jnp.asarray(rng.random(E) > 0.2)

            se = nb.recency_eid_init(N, B)
            sp = nb.recency_pk_init(N, B)
            for rep in range(3):
                se = nb.recency_eid_update(se, src, dst, t + rep * 3, eids, valid, False)
                sp = nb.recency_pk_update(sp, src, dst, t + rep * 3, eids, valid, False)
            buf, wp = sp
            np.testing.assert_array_equal(np.asarray(buf[:, :, 0]), np.asarray(se[0]))
            np.testing.assert_array_equal(np.asarray(buf[:, :, 1]), np.asarray(se[1]))
            np.testing.assert_array_equal(np.asarray(buf[:, :, 2]), np.asarray(se[2]))
            np.testing.assert_array_equal(np.asarray(wp % B), np.asarray(se[3] % B))

            seeds = jnp.asarray(rng.integers(0, N, 16), jnp.int32)
            qt = jnp.asarray(rng.integers(0, 60, 16), jnp.int32)
            for k in (1, 3, 5):
                out_e = nb.recency_eid_query(se, seeds, qt, k)
                out_p = nb.recency_pk_query(sp, seeds, qt, k)
                for a, b in zip(out_e, out_p):
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        nb.USE_DENSE_PUSH = None


def test_recency_hook_packed_buffers_stream_equivalence(dg):
    """RecencyNeighborHook(packed_buffers=True) must emit identical batches
    to the separate-buffer eid hook over a streamed epoch."""
    edge_x_full = dg._storage._data.edge_x
    hooks = [
        RecencyNeighborHook(4, [3], ["edge_src", "edge_dst"],
                            ["edge_time", "edge_time"],
                            edge_x_full=edge_x_full, packed_buffers=p)
        for p in (False, True)
    ]
    loader = DGDataLoader(dg, batch_size=2)
    for b in loader:
        outs = []
        for h in hooks:
            bb = h(dg, b)
            outs.append((np.asarray(bb.nbr_nids[0]), np.asarray(bb.nbr_edge_time[0]),
                         np.asarray(bb.nbr_edge_x[0])))
        for a, c in zip(*outs):
            np.testing.assert_array_equal(a, c)


def test_recency_hook_packed_requires_eid_mode():
    with pytest.raises(ValueError):
        RecencyNeighborHook(4, [3], ["edge_src"], ["edge_time"],
                            packed_buffers=True)


# ------------------------------------------------------------------ #
# Historical negative sampler breadth
# ------------------------------------------------------------------ #
def test_historical_first_batch_has_no_history(dg):
    h = HistoricalNegativeEdgeSamplerHook()
    loader = DGDataLoader(dg, batch_size=2)
    b0 = h(dg, next(iter(loader)))
    # Nothing logged yet: every negative must be invalid/PAD.
    assert not bool(np.asarray(b0.valid_neg_mask).any())
    assert (np.asarray(b0.neg) == PADDED_NODE_ID).all()


def test_historical_negatives_come_from_source_history(dg):
    h = HistoricalNegativeEdgeSamplerHook()
    loader = DGDataLoader(dg, batch_size=1)
    seen_by_src: dict = {}
    for b in loader:
        b = h(dg, b)
        src = np.asarray(b.edge_src)
        neg = np.asarray(b.neg)
        valid = np.asarray(b.valid_neg_mask) & np.asarray(b.edge_valid)
        for i in range(len(src)):
            if valid[i]:
                assert neg[i] in seen_by_src.get(int(src[i]), set()), (
                    src[i], neg[i], seen_by_src)
        ev = np.asarray(b.edge_valid)
        for s, d in zip(src[ev], np.asarray(b.edge_dst)[ev]):
            seen_by_src.setdefault(int(s), set()).add(int(d))


def test_historical_reset_clears_log(dg):
    h = HistoricalNegativeEdgeSamplerHook()
    loader = DGDataLoader(dg, batch_size=2)
    for b in loader:
        h(dg, b)
    h.reset_state()
    b0 = h(dg, next(iter(DGDataLoader(dg, batch_size=2))))
    assert not bool(np.asarray(b0.valid_neg_mask).any())


def test_historical_log_count_tracks_valid_edges(dg):
    h = HistoricalNegativeEdgeSamplerHook()
    loader = DGDataLoader(dg, batch_size=3)  # padded final batch
    total = 0
    for b in loader:
        b = h(dg, b)
        total += int(np.asarray(b.edge_valid).sum())
    assert int(np.asarray(h.state[3])) == total
