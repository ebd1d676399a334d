import numpy as np
import pytest

from tgm_tpu.data import DGData, TemporalRatioSplit, TemporalSplit
from tgm_tpu.exceptions import (
    EmptyGraphError,
    EventOrderedConversionError,
    InvalidDiscretizationError,
    InvalidNodeIDError,
)


def make_data(tiny_events, **kw):
    edge_time, edge_index, edge_x = tiny_events
    return DGData.from_raw(edge_time=edge_time, edge_index=edge_index, edge_x=edge_x, **kw)


def test_from_raw_basic(tiny_events):
    d = make_data(tiny_events)
    assert d.num_edge_events == 8
    assert d.num_events == 8
    assert d.num_nodes == 4
    np.testing.assert_array_equal(d.edge_time, tiny_events[0])
    assert d.edge_index.dtype == np.int32
    assert d.edge_x.dtype == np.float32
    assert d.time.dtype == np.int64


def test_auto_sort():
    t = np.array([5, 1, 3], dtype=np.int64)
    ei = np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int64)
    ex = np.array([[5.0], [1.0], [3.0]], dtype=np.float32)
    d = DGData.from_raw(edge_time=t, edge_index=ei, edge_x=ex)
    np.testing.assert_array_equal(d.edge_time, [1, 3, 5])
    np.testing.assert_array_equal(d.edge_index, [[1, 2], [2, 0], [0, 1]])
    np.testing.assert_array_equal(d.edge_x[:, 0], [1.0, 3.0, 5.0])


def test_negative_time_rejected():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([-1, 2]), edge_index=np.array([[0, 1], [1, 2]])
        )


def test_padded_node_id_rejected():
    with pytest.raises(InvalidNodeIDError):
        DGData.from_raw(edge_time=np.array([1]), edge_index=np.array([[-1, 1]]))


def test_empty_graph_rejected():
    with pytest.raises(EmptyGraphError):
        DGData.from_raw(
            edge_time=np.array([], dtype=np.int64),
            edge_index=np.zeros((0, 2), dtype=np.int64),
        )


def test_nan_rejected():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 2]]),
            edge_x=np.array([[np.nan], [1.0]], dtype=np.float32),
        )


def test_float64_downcast_warns(tiny_events):
    edge_time, edge_index, _ = tiny_events
    with pytest.warns(UserWarning):
        d = DGData.from_raw(
            edge_time=edge_time,
            edge_index=edge_index,
            edge_x=np.ones((8, 3), dtype=np.float64),
        )
    assert d.edge_x.dtype == np.float32


def test_node_events(tiny_events):
    edge_time, edge_index, edge_x = tiny_events
    d = DGData.from_raw(
        edge_time=edge_time,
        edge_index=edge_index,
        edge_x=edge_x,
        node_x_time=np.array([3, 7], dtype=np.int64),
        node_x_nids=np.array([1, 2], dtype=np.int64),
        node_x=np.ones((2, 4), dtype=np.float32),
    )
    assert d.num_events == 10
    np.testing.assert_array_equal(d.node_x_time, [3, 7])
    # interleaved timeline is sorted
    assert np.all(np.diff(d.time) >= 0)
    # masks point at correct times
    np.testing.assert_array_equal(d.time[d.edge_mask], edge_time)


def test_node_label_out_of_range(tiny_events):
    edge_time, edge_index, _ = tiny_events
    with pytest.raises(InvalidNodeIDError):
        DGData.from_raw(
            edge_time=edge_time,
            edge_index=edge_index,
            node_y_time=np.array([3]),
            node_y_nids=np.array([99]),
            node_y=np.ones((1, 1), dtype=np.float32),
        )


def test_static_node_x_too_small(tiny_events):
    edge_time, edge_index, _ = tiny_events
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=edge_time,
            edge_index=edge_index,
            static_node_x=np.ones((2, 5), dtype=np.float32),
        )


def test_clone_is_deep(tiny_events):
    d = make_data(tiny_events)
    c = d.clone()
    c.edge_index[0, 0] = 3
    assert d.edge_index[0, 0] == 0


def test_split_ratio(tiny_events):
    d = make_data(tiny_events, time_delta="s")
    parts = d.split(TemporalRatioSplit(0.5, 0.25, 0.25))
    # span = 20, val_time = 1 + 10 = 11, test_time = 11 + 5 = 16
    # val window [11, 16) is empty and dropped (reference semantics)
    assert len(parts) == 2
    train, test = parts
    assert train.num_edge_events == 7
    assert test.num_edge_events == 1
    assert train.edge_time.max() <= 11
    assert test.edge_time.min() >= 16


def test_split_temporal(tiny_events):
    d = make_data(tiny_events, time_delta="s")
    parts = d.split(TemporalSplit(val_time=5, test_time=9))
    assert len(parts) == 3
    train, val, test = parts
    np.testing.assert_array_equal(train.edge_time, [1, 1, 2])
    np.testing.assert_array_equal(val.edge_time, [5, 5, 8])
    np.testing.assert_array_equal(test.edge_time, [9, 20])


def test_discretize_first_dedup():
    # Two events of same edge in same bucket keep the first's features.
    t = np.array([0, 1, 2, 11], dtype=np.int64)
    ei = np.array([[0, 1], [0, 1], [1, 2], [0, 1]], dtype=np.int64)
    ex = np.array([[10.0], [20.0], [30.0], [40.0]], dtype=np.float32)
    from tgm_tpu.timedelta import TimeDeltaDG

    d = DGData.from_raw(edge_time=t, edge_index=ei, edge_x=ex, time_delta="s")
    coarse = d.discretize(TimeDeltaDG("s", 10))
    # buckets: 0,0,0,1 -> edges (0,1)@b0 first occurrence keeps feat 10, (1,2)@b0, (0,1)@b1
    assert coarse.num_edge_events == 3
    np.testing.assert_array_equal(coarse.edge_time, [0, 0, 1])
    np.testing.assert_array_equal(coarse.edge_index, [[0, 1], [1, 2], [0, 1]])
    np.testing.assert_array_equal(coarse.edge_x[:, 0], [10.0, 30.0, 40.0])


def test_discretize_errors(tiny_events):
    d = make_data(tiny_events, time_delta="h")
    with pytest.raises(InvalidDiscretizationError):
        d.discretize("m")  # finer
    d_r = make_data(tiny_events, time_delta="r")
    with pytest.raises(EventOrderedConversionError):
        d_r.discretize("s")


def test_discretize_identity(tiny_events):
    d = make_data(tiny_events, time_delta="s")
    same = d.discretize(None)
    np.testing.assert_array_equal(same.edge_time, d.edge_time)
    same2 = d.discretize("s")
    np.testing.assert_array_equal(same2.edge_time, d.edge_time)


# ------------------------------------------------------------------ #
# Validation-matrix breadth (mirrors reference test_data.py error paths)
# ------------------------------------------------------------------ #
def test_bad_edge_index_shapes():
    t = np.array([1, 2])
    with pytest.raises((ValueError, IndexError)):
        DGData.from_raw(edge_time=t, edge_index=np.array([0, 1]), time_delta="s")
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=t, edge_index=np.array([[0, 1, 2], [1, 2, 3]]),
            time_delta="s",
        )


def test_mismatched_edge_time_length():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([1, 2, 3]),
            edge_index=np.array([[0, 1], [1, 2]]),
            time_delta="s",
        )


def test_mismatched_edge_feature_rows():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 2]]),
            edge_x=np.ones((3, 4), np.float32),
            time_delta="s",
        )


def test_non_integral_ids_rejected():
    with pytest.raises((ValueError, TypeError)):
        DGData.from_raw(
            edge_time=np.array([1.0, 2.0]),
            edge_index=np.array([[0.5, 1.2], [1.1, 2.9]]),
            time_delta="s",
        )


def test_node_events_without_features_rejected_shape():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 2]]),
            node_x_time=np.array([1, 2]),
            node_x_nids=np.array([0]),  # mismatched lengths
            node_x=np.ones((2, 3), np.float32),
            time_delta="s",
        )


def test_node_label_shape_mismatch():
    with pytest.raises(ValueError):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 2]]),
            node_y_time=np.array([1]),
            node_y_nids=np.array([0]),
            node_y=np.ones((2, 1), np.float32),  # 2 rows for 1 event
            time_delta="s",
        )


def test_time_delta_object_accepted():
    from tgm_tpu.timedelta import TimeDeltaDG

    d = DGData.from_raw(
        edge_time=np.array([1, 2]),
        edge_index=np.array([[0, 1], [1, 2]]),
        time_delta=TimeDeltaDG("m", 5),
    )
    assert d.time_delta.unit == "m" and d.time_delta.value == 5


def test_event_ordered_time_delta():
    d = DGData.from_raw(
        edge_time=np.array([0, 1, 2]),
        edge_index=np.array([[0, 1], [1, 2], [2, 0]]),
        time_delta="r",
    )
    assert d.time_delta.is_event_ordered


def test_unsorted_node_events_resorted_consistently():
    # Edge + node events given out of order: the unified timeline must be
    # sorted and keep (time, nid, feature) rows aligned.
    d = DGData.from_raw(
        edge_time=np.array([5, 1]),
        edge_index=np.array([[0, 1], [1, 2]]),
        node_x_time=np.array([4, 2]),
        node_x_nids=np.array([3, 0]),
        node_x=np.array([[4.0], [2.0]], np.float32),
        time_delta="s",
    )
    np.testing.assert_array_equal(d.edge_time, [1, 5])
    order = np.argsort(d.node_x_time)
    np.testing.assert_array_equal(d.node_x_time[order], [2, 4])
    np.testing.assert_array_equal(d.node_x_nids[order], [0, 3])
    np.testing.assert_array_equal(d.node_x[order].reshape(-1), [2.0, 4.0])


def test_num_nodes_covers_all_event_kinds():
    d = DGData.from_raw(
        edge_time=np.array([1]),
        edge_index=np.array([[0, 1]]),
        node_x_time=np.array([2]),
        node_x_nids=np.array([7]),
        node_x=np.ones((1, 1), np.float32),
        time_delta="s",
    )
    assert d.num_nodes >= 8
