"""NodeAnalyticsHook behavior tests.

Mirrors the reference's per-tracked-node analytics coverage
(/root/reference/test/unit/test_hooks/test_node_analytics_hook.py) against
our vectorized bitmap/array-state design: per-node degree/lifetime/activity,
batch novelty and density, state accumulation across batches, reset, and
validation — with hand-computed expected values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.hooks import NodeAnalyticsHook


def make_dg(src, dst, t, num_nodes=None):
    src = np.asarray(src)
    dst = np.asarray(dst)
    data = DGData.from_raw(
        edge_time=np.asarray(t),
        edge_index=np.stack([src, dst], axis=1),
        time_delta="s",
    )
    return DGraph(data)


@pytest.fixture
def dg():
    # Edges: (0->1 @1), (1->2 @2), (0->2 @3), (0->1 @4 repeat), (3->4 @5)
    return make_dg([0, 1, 0, 0, 3], [1, 2, 2, 1, 4], [1, 2, 3, 4, 5])


def run_full_batch(dg, hook):
    return hook(dg, dg.materialize())


def test_init_validation():
    with pytest.raises(ValueError):
        NodeAnalyticsHook(tracked_nodes=[0], num_nodes=0)
    with pytest.raises(ValueError):
        NodeAnalyticsHook(tracked_nodes=[0], num_nodes=-3)


def test_tracked_nodes_deduplicated_and_sorted():
    h = NodeAnalyticsHook(tracked_nodes=[3, 1, 3, 1, 2], num_nodes=10)
    np.testing.assert_array_equal(np.asarray(h.tracked_nodes), [1, 2, 3])


def test_produces_and_requires(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=5)
    assert {"edge_src", "edge_dst", "edge_time"} <= set(h.requires)
    assert {"node_stats", "node_macro_stats", "edge_stats"} <= set(h.produces)
    b = run_full_batch(dg, h)
    for key in ("node_stats", "node_macro_stats", "edge_stats"):
        assert b.has(key)


def test_degree_counts_both_endpoints(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 1, 2, 3, 4], num_nodes=5)
    b = run_full_batch(dg, h)
    # degrees over all 5 edges: 0 appears 3x as src; 1 twice as dst + once
    # as src; 2 twice as dst; 3 once; 4 once.
    np.testing.assert_array_equal(np.asarray(b.node_stats["degree"]), [3, 3, 2, 1, 1])


def test_lifetime_and_first_last_seen(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 1, 4], num_nodes=5)
    b = run_full_batch(dg, h)
    # 0 seen at t=1..4 -> lifetime 3; 1 seen at t=1..4 -> 3; 4 only at t=5 -> 0
    np.testing.assert_array_equal(np.asarray(b.node_stats["lifetime"]), [3, 3, 0])


def test_time_since_seen_relative_to_batch_max(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 2, 4], num_nodes=5)
    b = run_full_batch(dg, h)
    # batch max time = 5; 0 last seen at 4, 2 at 3, 4 at 5.
    np.testing.assert_array_equal(
        np.asarray(b.node_stats["time_since_seen"]), [1, 2, 0]
    )


def test_never_seen_tracked_node_sentinels():
    dg = make_dg([0], [1], [7])
    h = NodeAnalyticsHook(tracked_nodes=[0, 3], num_nodes=5)
    b = run_full_batch(dg, h)
    assert int(b.node_stats["time_since_seen"][1]) == -1
    assert int(b.node_stats["lifetime"][1]) == 0
    assert int(b.node_stats["appearances"][1]) == 0
    assert int(b.node_stats["degree"][1]) == 0


def test_appearances_accumulate_across_batches(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 1, 3], num_nodes=5)
    loader = DGDataLoader(dg, batch_size=2)
    batches = [h(dg, b) for b in loader]  # batches: 2 + 2 + 1 edges
    last = batches[-1]
    # Node 0 appears in batch0 (t1) + batch1 (t3, t4) = 2 batch appearances;
    # node 1 in batch0 + batch1 = 2; node 3 only in batch2 = 1.
    np.testing.assert_array_equal(np.asarray(last.node_stats["appearances"]), [2, 2, 1])


def test_node_macro_stats_novelty(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 1, 2, 3, 4], num_nodes=5)
    loader = DGDataLoader(dg, batch_size=3)
    b0 = h(dg, next(iter(loader)))
    # First batch: edges (0,1),(1,2),(0,2) -> tracked new nodes {0,1,2}.
    assert int(b0.node_macro_stats["new_node_count"]) == 3
    assert float(b0.node_macro_stats["node_novelty"]) == 1.0
    batches = list(loader)
    b1 = h(dg, batches[1])
    # Second batch: edges (0,1),(3,4) -> appeared {0,1,3,4}, new {3,4}.
    assert int(b1.node_macro_stats["new_node_count"]) == 2
    assert float(b1.node_macro_stats["node_novelty"]) == pytest.approx(0.5)


def test_edge_novelty_and_new_edge_count(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=5)
    loader = DGDataLoader(dg, batch_size=3)
    batches = list(loader)
    b0 = h(dg, batches[0])
    assert int(b0.edge_stats["new_edge_count"]) == 3
    assert float(b0.edge_stats["edge_novelty"]) == 1.0
    b1 = h(dg, batches[1])
    # (0,1) was already seen; (3,4) is new.
    assert int(b1.edge_stats["new_edge_count"]) == 1
    assert float(b1.edge_stats["edge_novelty"]) == pytest.approx(0.5)


def test_edge_density(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=5)
    loader = DGDataLoader(dg, batch_size=3)
    b0 = h(dg, next(iter(loader)))
    # Batch 0: 3 edges over nodes {0,1,2} -> density 3 / (3*2/2) = 1.0.
    assert float(b0.edge_stats["edge_density"]) == pytest.approx(1.0)


def test_edge_stats_all_fields(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=5)
    b = run_full_batch(dg, h)
    assert {"edge_novelty", "edge_density", "new_edge_count"} <= set(b.edge_stats)


def test_node_stats_all_fields(dg):
    h = NodeAnalyticsHook(tracked_nodes=[2], num_nodes=5)
    b = run_full_batch(dg, h)
    assert {"degree", "activity", "lifetime", "time_since_seen", "appearances"} == set(
        b.node_stats
    )
    for v in b.node_stats.values():
        assert v.shape == (1,)


def test_reset_state(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 1], num_nodes=5)
    run_full_batch(dg, h)
    assert h.state is not None
    h.reset_state()
    assert h.state is None
    b = run_full_batch(dg, h)
    # After reset the batch's DISTINCT pairs are novel again: 4 new pairs
    # over 5 edges (0->1 repeats within the batch; the reference's seen-set
    # loop counts a within-batch repeat once — node_analytics.py:202-207).
    assert int(b.edge_stats["new_edge_count"]) == 4
    assert float(b.edge_stats["edge_novelty"]) == pytest.approx(4 / 5)


def test_padded_rows_ignored(dg):
    h = NodeAnalyticsHook(tracked_nodes=[0, 1, 2, 3, 4], num_nodes=5)
    # drop_last=False pads the final batch; stats must ignore padded rows.
    loader = DGDataLoader(dg, batch_size=4)
    batches = list(loader)
    last = batches[-1]
    assert int(last.edge_valid.sum()) == 1  # static shape, 1 valid row
    assert last.edge_src.shape[0] > 1
    b = h(dg, last)
    np.testing.assert_array_equal(np.asarray(b.node_stats["degree"]), [0, 0, 0, 1, 1])
    assert int(b.edge_stats["new_edge_count"]) == 1


def test_hook_with_custom_id(dg):
    # Per-instance ids suffix the produced keys so two trackers can coexist.
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=5, id="tracker")
    b = run_full_batch(dg, h)
    assert b.has("node_stats_tracker")
    assert not b.has("node_stats")


def test_exact_novelty_matches_python_set():
    """Auto-exact mode (small pair space) reproduces the reference's Python
    seen-set exactly on a random stream, and reports itself exact."""
    import jax.numpy as jnp

    from tgm_tpu.core.batch import DGBatch

    N = 50
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=N)
    assert h._exact
    state = h.init_state(None)
    rng = np.random.default_rng(0)
    seen = set()
    for step in range(6):
        B = 32
        src = rng.integers(0, N, B).astype(np.int32)
        dst = rng.integers(0, N, B).astype(np.int32)
        t = np.sort(rng.integers(step * 100, step * 100 + 99, B)).astype(np.int32)
        batch = DGBatch(
            edge_src=jnp.asarray(src), edge_dst=jnp.asarray(dst),
            edge_time=jnp.asarray(t), edge_valid=jnp.ones(B, bool),
        )
        state, batch = h.apply(state, batch)
        expect_new = 0
        for s, d in zip(src.tolist(), dst.tolist()):
            if (s, d) not in seen:
                expect_new += 1
                seen.add((s, d))
        assert int(batch.edge_stats["new_edge_count"]) == expect_new, step
        assert bool(batch.edge_stats["novelty_is_exact"])


def test_hashed_novelty_flagged_approximate():
    h = NodeAnalyticsHook(tracked_nodes=[0], num_nodes=50, exact_edges=False,
                          edge_hash_bits=8)
    assert not h._exact
    state = h.init_state(None)
    import jax.numpy as jnp

    from tgm_tpu.core.batch import DGBatch

    batch = DGBatch(
        edge_src=jnp.asarray([1, 2], jnp.int32),
        edge_dst=jnp.asarray([3, 4], jnp.int32),
        edge_time=jnp.asarray([1, 2], jnp.int32),
        edge_valid=jnp.ones(2, bool),
    )
    state, batch = h.apply(state, batch)
    assert not bool(batch.edge_stats["novelty_is_exact"])
    assert 0.0 < float(batch.edge_stats["seen_bitmap_load"]) <= 2 / 256
