"""BatchAnalyticsHook behavior tests with hand-computed expectations
(mirrors /root/reference/test/unit/test_hooks/test_batch_analytics_hook.py)."""

import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.hooks import BatchAnalyticsHook


@pytest.fixture
def dg():
    # Edges: (0,1)@1, (0,1)@1 repeat, (1,2)@2, (2,3)@2, (0,2)@5
    return DGraph(
        DGData.from_raw(
            edge_time=np.array([1, 1, 2, 2, 5]),
            edge_index=np.array([[0, 1], [0, 1], [1, 2], [2, 3], [0, 2]]),
            time_delta="s",
        )
    )


def test_full_batch_stats(dg):
    b = BatchAnalyticsHook()(dg, dg.materialize())
    assert int(b.num_edge_events) == 5
    assert int(b.num_node_events) == 0
    assert int(b.num_unique_timestamps) == 3  # {1, 2, 5}
    assert int(b.num_unique_nodes) == 4  # {0,1,2,3}
    assert float(b.avg_degree) == pytest.approx(2 * 5 / 4)
    assert int(b.num_repeated_edge_events) == 1  # (0,1)@1 twice
    assert int(b.num_repeated_node_events) == 0


def test_stateless(dg):
    h = BatchAnalyticsHook()
    assert not h.has_state
    b1 = h(dg, dg.materialize())
    b2 = h(dg, dg.materialize())
    assert int(b1.num_repeated_edge_events) == int(b2.num_repeated_edge_events)


def test_padded_rows_excluded(dg):
    h = BatchAnalyticsHook()
    batches = list(DGDataLoader(dg, batch_size=4))
    last = h(dg, batches[-1])  # 1 valid edge + padding
    assert int(last.num_edge_events) == 1
    assert int(last.num_unique_timestamps) == 1
    assert int(last.num_unique_nodes) == 2
    assert int(last.num_repeated_edge_events) == 0


def test_node_events_counted():
    dg = DGraph(
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 2]]),
            node_x_time=np.array([2, 2]),
            node_x_nids=np.array([5, 5]),
            node_x=np.ones((2, 1), np.float32),
            time_delta="s",
        )
    )
    b = BatchAnalyticsHook()(dg, dg.materialize())
    assert int(b.num_node_events) == 2
    assert int(b.num_repeated_node_events) == 1  # same (nid, time) twice
    assert int(b.num_unique_nodes) == 4  # {0,1,2,5}
    assert int(b.num_unique_timestamps) == 2  # {1, 2}


def test_hook_id_suffix(dg):
    b = BatchAnalyticsHook(id="s1")(dg, dg.materialize())
    assert b.has("avg_degree_s1")
    assert not b.has("avg_degree")


def test_produces_surface(dg):
    h = BatchAnalyticsHook()
    assert {
        "num_edge_events", "num_node_events", "num_unique_timestamps",
        "num_unique_nodes", "avg_degree", "num_repeated_edge_events",
        "num_repeated_node_events",
    } <= set(h.produces)
