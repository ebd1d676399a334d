"""Storage-backend surface tests (mirrors reference test coverage breadth:
/root/reference/test/unit/test_core/test_storage_impl.py — per-query-method
behavior over mixed event kinds, feature/type accessors, slice interaction)."""

import numpy as np
import pytest

from tgm_tpu.core._storage import DGStorage, DGSliceTracker
from tgm_tpu.data.dg_data import DGData


@pytest.fixture
def mixed_data():
    """Edges at t=1,2,2,5,9; node events at t=3,5; node labels at t=4,9."""
    return DGData.from_raw(
        edge_time=np.array([1, 2, 2, 5, 9]),
        edge_index=np.array([[0, 1], [1, 2], [0, 2], [2, 3], [3, 0]]),
        edge_x=np.arange(10, dtype=np.float32).reshape(5, 2),
        edge_type=np.array([0, 1, 0, 1, 0]),
        node_x_time=np.array([3, 5]),
        node_x_nids=np.array([1, 3]),
        node_x=np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]], np.float32),
        node_y_time=np.array([4, 9]),
        node_y_nids=np.array([2, 0]),
        node_y=np.array([[0.5], [0.7]], np.float32),
        static_node_x=np.eye(4, dtype=np.float32),
        node_type=np.array([0, 0, 1, 1]),
        time_delta="s",
    )


@pytest.fixture
def storage(mixed_data):
    return DGStorage(mixed_data)


FULL = DGSliceTracker()


def test_start_end_time(storage):
    assert storage.get_start_time(FULL) == 1
    assert storage.get_end_time(FULL) == 9
    window = DGSliceTracker(start_time=2, end_time=5)
    assert storage.get_start_time(window) == 2
    assert storage.get_end_time(window) == 5


def test_get_nodes_includes_node_events(storage):
    # Edge endpoints {0,1,2,3}; node-event ids {1,3} add nothing new here,
    # but a time window isolates them.
    assert storage.get_nodes(FULL) == {0, 1, 2, 3}
    window = DGSliceTracker(start_time=3, end_time=3)
    # Only the node event (1 @ t=3) is inside.
    assert storage.get_nodes(window) == {1}


def test_get_edges_window(storage):
    src, dst, t = storage.get_edges(DGSliceTracker(start_time=2, end_time=5))
    np.testing.assert_array_equal(t, [2, 2, 5])
    np.testing.assert_array_equal(src, [1, 0, 2])
    np.testing.assert_array_equal(dst, [2, 2, 3])


def test_get_node_events_and_labels(storage):
    nids, t = storage.get_node_events(FULL)
    np.testing.assert_array_equal(nids, [1, 3])
    np.testing.assert_array_equal(t, [3, 5])
    nids, t = storage.get_node_labels(DGSliceTracker(start_time=5, end_time=None))
    np.testing.assert_array_equal(nids, [0])
    np.testing.assert_array_equal(t, [9])


def test_num_timestamps_and_events(storage):
    # Unique timestamps across ALL event kinds: {1,2,3,4,5,9}.
    assert storage.get_num_timestamps(FULL) == 6
    # Events: 5 edges + 2 node events + 2 labels.
    assert storage.get_num_events(FULL) == 9
    window = DGSliceTracker(start_time=2, end_time=4)  # inclusive bounds
    assert storage.get_num_timestamps(window) == 3  # {2, 3, 4}
    assert storage.get_num_events(window) == 4  # 2 edges @2 + 1 node ev + 1 label


def test_feature_accessors(storage):
    ex = storage.get_edge_x(DGSliceTracker(start_time=5, end_time=None))
    np.testing.assert_array_equal(ex, [[6.0, 7.0], [8.0, 9.0]])
    et = storage.get_edge_type(DGSliceTracker(start_time=5, end_time=None))
    np.testing.assert_array_equal(et, [1, 0])
    t, nids, x = storage.get_node_x(FULL)
    np.testing.assert_array_equal(nids, [1, 3])
    assert x.shape == (2, 3)
    t, nids, y = storage.get_node_y(FULL)
    np.testing.assert_array_equal(nids, [2, 0])
    np.testing.assert_allclose(y[:, 0], [0.5, 0.7])


def test_static_accessors(storage):
    np.testing.assert_array_equal(storage.get_static_node_x(), np.eye(4))
    np.testing.assert_array_equal(storage.get_node_type(), [0, 0, 1, 1])
    assert storage.get_node_x_dim() == 3
    assert storage.get_node_y_dim() == 1
    assert storage.get_edge_x_dim() == 2
    assert storage.get_static_node_x_dim() == 4


def test_accessors_absent_fields():
    data = DGData.from_raw(
        edge_time=np.array([1, 2]), edge_index=np.array([[0, 1], [1, 0]]),
        time_delta="s",
    )
    s = DGStorage(data)
    assert s.get_edge_x(FULL) is None
    assert s.get_edge_type(FULL) is None
    assert s.get_node_x(FULL) is None
    assert s.get_node_y(FULL) is None
    assert s.get_static_node_x() is None
    assert s.get_node_type() is None
    assert s.get_edge_x_dim() in (None, 0)
    nids, t = s.get_node_events(FULL)
    assert len(nids) == 0


def test_get_edge_rows_contiguous(storage):
    rows = storage.get_edge_rows(DGSliceTracker(start_time=2, end_time=5))
    assert rows == slice(1, 4)


def test_empty_window(storage):
    empty = DGSliceTracker(start_time=6, end_time=8)
    src, dst, t = storage.get_edges(empty)
    assert len(src) == 0
    assert storage.get_num_events(empty) == 0
    assert storage.get_nodes(empty) == set()


def test_index_slice_bounds(storage):
    # Event-index slicing covers the unified timeline (all event kinds).
    first_four = DGSliceTracker(start_idx=0, end_idx=4)
    # Timeline order: e@1, e@2, e@2, nx@3, ny@4, e@5, nx@5, e@9, ny@9.
    src, dst, t = storage.get_edges(first_four)
    np.testing.assert_array_equal(t, [1, 2, 2])
    nids, t = storage.get_node_events(first_four)
    np.testing.assert_array_equal(nids, [1])


# ------------------------------------------------------------------ #
# Type accessors (reference: test_get_edge_type / test_get_node_type)
# ------------------------------------------------------------------ #
def test_get_edge_type_full_and_sliced(storage):
    np.testing.assert_array_equal(storage.get_edge_type(FULL), [0, 1, 0, 1, 0])
    # Time-windowed slice keeps the aligned subset.
    win = DGSliceTracker(start_time=2, end_time=5)
    np.testing.assert_array_equal(storage.get_edge_type(win), [1, 0, 1])


def test_get_node_type(storage):
    np.testing.assert_array_equal(storage.get_node_type(), [0, 0, 1, 1])


def test_type_accessors_absent():
    data = DGData.from_raw(
        edge_time=np.array([1, 2]),
        edge_index=np.array([[0, 1], [1, 2]]),
        time_delta="s",
    )
    s = DGStorage(data)
    assert s.get_edge_type(FULL) is None
    assert s.get_node_type() is None


def test_edge_type_validation_length():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 2]]),
            edge_type=np.array([0]),  # wrong length
            time_delta="s",
        )
