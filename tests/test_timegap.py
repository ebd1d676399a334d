"""TimeGapNeighborMeanHook behavior tests (hand-computed expectations).

Reference semantics: GraphMixerHook
(/root/reference/examples/linkproppred/graphmixer.py:229-258) — window =
last ``time_gap`` events by split-local index strictly before the batch
(time <= min_batch_time - 1), multiplicity-weighted neighbor-feature mean,
zeros for seeds with no window neighbors. End-to-end exactness vs the torch
reference is separately proven by tools/parity_zoo2.py (graphmixer_lr0).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tgm_tpu.core.batch import DGBatch
from tgm_tpu.hooks import TimeGapNeighborMeanHook


def make_batch(src, dst, t, ids, valid=None):
    n = len(src)
    b = DGBatch(
        edge_src=jnp.asarray(src, jnp.int32),
        edge_dst=jnp.asarray(dst, jnp.int32),
        edge_time=jnp.asarray(t, jnp.int32),
        edge_valid=jnp.asarray(
            valid if valid is not None else np.ones(n, bool)
        ),
    )
    b.edge_ids = jnp.asarray(ids, jnp.int32)
    return b


def test_window_mean_multiplicity_and_empty():
    # Split events (index: src -> dst @ time):
    # 0: 0->1 @ 1 | 1: 0->2 @ 2 | 2: 1->2 @ 3 | 3: 0->1 @ 4 | 4: 2->3 @ 5
    src = np.array([0, 0, 1, 0, 2], np.int32)
    dst = np.array([1, 2, 2, 1, 3], np.int32)
    t = np.array([1, 2, 3, 4, 5], np.int32)
    node_x = np.arange(5, dtype=np.float32)[:, None] * 10  # feat(i) = 10i
    hook = TimeGapNeighborMeanHook(
        src, dst, t, node_x, time_gap=3, seed_nodes_keys=["edge_src", "edge_dst"]
    )

    # Batch = events [3, 5): min_time = 4, window = indices [0, 3) clipped to
    # [max(5-3,0), 5) = [2, 5) with time <= 3 -> only index 2 (1->2 @ 3).
    batch = make_batch([0, 2], [1, 3], [4, 5], [3, 4])
    _, batch = hook.apply(None, batch)
    feat = np.asarray(batch.time_gap_feat)
    count = np.asarray(batch.time_gap_count)
    # seeds = [0, 2, 1, 3]; window edge (1,2): nbrs(1)={2}, nbrs(2)={1}
    np.testing.assert_array_equal(count, [0, 1, 1, 0])
    np.testing.assert_allclose(feat[:, 0], [0.0, 10.0, 20.0, 0.0])


def test_multiplicity_weighted_mean_and_batch_exclusion():
    # Node 0 appears twice with nbr 1 and once with nbr 2 in the window.
    src = np.array([0, 0, 0, 3], np.int32)
    dst = np.array([1, 1, 2, 4], np.int32)
    t = np.array([1, 2, 3, 10], np.int32)
    node_x = np.arange(5, dtype=np.float32)[:, None]
    hook = TimeGapNeighborMeanHook(
        src, dst, t, node_x, time_gap=10, seed_nodes_keys=["edge_src"]
    )
    batch = make_batch([0], [4], [10], [3])
    _, batch = hook.apply(None, batch)
    # window = [0, 4) time <= 9 -> indices 0,1,2: nbrs(0) = [1, 1, 2]
    np.testing.assert_allclose(np.asarray(batch.time_gap_count), [3.0])
    np.testing.assert_allclose(np.asarray(batch.time_gap_feat)[0, 0], 4.0 / 3.0)


def test_time_tie_exclusion_and_padding():
    # Events at the batch's min time are EXCLUDED (end_time = min_t - 1),
    # padded seeds produce zeros.
    src = np.array([0, 1], np.int32)
    dst = np.array([1, 2], np.int32)
    t = np.array([5, 5], np.int32)
    node_x = np.ones((4, 2), np.float32)
    hook = TimeGapNeighborMeanHook(
        src, dst, t, node_x, time_gap=4, seed_nodes_keys=["edge_src"]
    )
    batch = make_batch([1, -1], [2, -1], [5, 0], [1, -1], valid=[True, False])
    _, batch = hook.apply(None, batch)
    np.testing.assert_array_equal(np.asarray(batch.time_gap_count), [0, 0])
    np.testing.assert_allclose(np.asarray(batch.time_gap_feat), 0.0)


def test_unclamped_end_with_partial_batch():
    # Reference end_idx = start + bsize even past the split's last event;
    # the padded sentinel rows must contribute nothing.
    src = np.array([0, 1, 2], np.int32)
    dst = np.array([1, 2, 3], np.int32)
    t = np.array([1, 2, 3], np.int32)
    node_x = np.arange(5, dtype=np.float32)[:, None]
    hook = TimeGapNeighborMeanHook(
        src, dst, t, node_x, time_gap=2, seed_nodes_keys=["edge_src"]
    )
    # Last batch: width 2, one real event (index 2), so end = 2 + 2 = 4;
    # window = [2, 4) time <= 2 -> empty (index 2 has time 3 = min_t).
    batch = make_batch([2, -1], [3, -1], [3, 0], [2, -1], valid=[True, False])
    _, batch = hook.apply(None, batch)
    np.testing.assert_array_equal(np.asarray(batch.time_gap_count), [0, 0])

    # Same with time_gap 4: window = [0, 4) time <= 2 -> indices 0,1.
    hook2 = TimeGapNeighborMeanHook(
        src, dst, t, node_x, time_gap=4, seed_nodes_keys=["edge_src"]
    )
    batch = make_batch([2, -1], [3, -1], [3, 0], [2, -1], valid=[True, False])
    _, batch = hook2.apply(None, batch)
    # nbrs(2) in window = [1] (edge 1->2 @ 2)
    np.testing.assert_array_equal(np.asarray(batch.time_gap_count), [1, 0])
    np.testing.assert_allclose(np.asarray(batch.time_gap_feat)[0, 0], 1.0)
