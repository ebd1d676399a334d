"""DGraph view/property surface (mirrors reference test_dgraph.py breadth)."""

import numpy as np
import pytest

from tgm_tpu import DGData, DGraph


@pytest.fixture
def dg():
    data = DGData.from_raw(
        edge_time=np.array([1, 2, 2, 5, 9]),
        edge_index=np.array([[0, 1], [1, 2], [0, 2], [2, 3], [3, 0]]),
        edge_x=np.arange(10, dtype=np.float32).reshape(5, 2),
        edge_type=np.array([0, 1, 0, 1, 0]),
        node_x_time=np.array([3, 5]),
        node_x_nids=np.array([1, 3]),
        node_x=np.ones((2, 3), np.float32),
        node_y_time=np.array([4, 9]),
        node_y_nids=np.array([2, 0]),
        node_y=np.array([[0.5], [0.7]], np.float32),
        static_node_x=np.eye(4, dtype=np.float32),
        node_type=np.array([0, 0, 1, 1]),
        time_delta="s",
    )
    return DGraph(data)


def test_event_counts(dg):
    assert dg.num_edge_events == 5
    assert dg.num_node_events == 2
    assert dg.num_node_labels == 2
    assert dg.num_events == 9
    assert dg.num_timestamps == 6


def test_counts_on_time_slice(dg):
    view = dg.slice_time(2, 6)  # [2, 6): t in {2,2,3,4,5,5}
    assert view.num_edge_events == 3  # t=2,2,5
    assert view.num_node_events == 2  # t=3,5
    assert view.num_node_labels == 1  # t=4
    assert view.num_timestamps == 4  # {2,3,4,5}
    assert view.start_time == 2 and view.end_time == 5


def test_edge_properties(dg):
    np.testing.assert_array_equal(dg.edge_src, [0, 1, 0, 2, 3])
    np.testing.assert_array_equal(dg.edge_dst, [1, 2, 2, 3, 0])
    np.testing.assert_array_equal(dg.edge_time, [1, 2, 2, 5, 9])
    assert dg.edge_x.shape == (5, 2)
    np.testing.assert_array_equal(dg.edge_type, [0, 1, 0, 1, 0])


def test_node_event_properties(dg):
    np.testing.assert_array_equal(dg.node_x_nids, [1, 3])
    np.testing.assert_array_equal(dg.node_x_time, [3, 5])
    np.testing.assert_array_equal(dg.node_y_nids, [2, 0])
    np.testing.assert_array_equal(dg.node_y_time, [4, 9])


def test_static_properties(dg):
    assert dg.num_nodes == 4
    np.testing.assert_array_equal(dg.static_node_x, np.eye(4))
    np.testing.assert_array_equal(dg.node_type, [0, 0, 1, 1])
    assert dg.static_node_x_dim == 4
    assert dg.node_x_dim == 3
    assert dg.node_y_dim == 1
    assert dg.edge_x_dim == 2


def test_views_share_storage(dg):
    view = dg.slice_time(2, 6)
    assert view._storage is dg._storage


def test_slice_validation(dg):
    with pytest.raises(ValueError):
        dg.slice_time(5, 2)
    with pytest.raises(ValueError):
        dg.slice_events(4, 1)


def test_num_nodes_is_slice_local_max(dg):
    # Reference semantics (tgm/core/graph.py:198-201): num_nodes = max id in
    # the SLICE + 1, not the global count.
    view = dg.slice_time(1, 2)  # only edge (0, 1)
    assert view.num_nodes == 2
    assert dg.num_nodes == 4


def test_empty_time_slice_counts(dg):
    view = dg.slice_time(6, 9)  # [6, 9): nothing
    assert view.num_edge_events == 0
    assert view.num_events == 0


def test_materialize_feature_toggle(dg):
    b = dg.materialize(materialize_features=False)
    assert b.edge_x is None and b.node_x is None and b.node_y is None
    b = dg.materialize()
    assert b.edge_x is not None and b.node_x is not None and b.node_y is not None


def test_materialize_edge_ids_global(dg):
    b = dg.slice_time(2, 6).materialize()
    ids = np.asarray(b.edge_ids)
    valid = np.asarray(b.edge_valid)
    np.testing.assert_array_equal(ids[valid], [1, 2, 3])  # rows of edges @2,2,5
