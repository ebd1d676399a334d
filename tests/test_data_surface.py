"""Data-layer surface tests (mirrors reference test_data.py breadth:
from_pandas variants, discretize over node events/labels and huge ids,
type-field validation, split strategy dispatch)."""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from tgm_tpu import DGData
from tgm_tpu.data.split import TemporalRatioSplit, TemporalSplit, TGBSplit
from tgm_tpu.exceptions import EventOrderedConversionError
from tgm_tpu.timedelta import TimeDeltaDG


# --------------------------------------------------------------------- #
# from_pandas
# --------------------------------------------------------------------- #
def _edge_df():
    return pd.DataFrame(
        {
            "u": [0, 1, 2, 0],
            "v": [1, 2, 3, 3],
            "t": [1, 2, 3, 4],
            "w0": [0.1, 0.2, 0.3, 0.4],
            "w1": [1.0, 2.0, 3.0, 4.0],
            "etype": [0, 1, 0, 1],
        }
    )


def test_from_pandas_edge_features_and_types():
    data = DGData.from_pandas(
        _edge_df(), "u", "v", "t", edge_x_col=["w0", "w1"],
        edge_type_col="etype", time_delta="s",
    )
    assert data.num_events == 4
    assert data.edge_x.shape == (4, 2)
    np.testing.assert_allclose(data.edge_x[:, 1], [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(data.edge_type, [0, 1, 0, 1])


def test_from_pandas_node_events_and_labels():
    node_df = pd.DataFrame({"nid": [1, 2], "t": [2, 3], "f0": [9.0, 8.0]})
    label_df = pd.DataFrame({"nid": [3], "t": [4], "y0": [0.5]})
    data = DGData.from_pandas(
        _edge_df(), "u", "v", "t",
        node_x_df=node_df, node_x_nids_col="nid", node_x_time_col="t",
        node_x_col=["f0"],
        node_y_df=label_df, node_y_nids_col="nid", node_y_time_col="t",
        node_y_col=["y0"],
        time_delta="s",
    )
    np.testing.assert_array_equal(data.node_x_nids, [1, 2])
    np.testing.assert_allclose(data.node_x[:, 0], [9.0, 8.0])
    np.testing.assert_array_equal(data.node_y_nids, [3])
    np.testing.assert_allclose(data.node_y[:, 0], [0.5])
    # Unified timeline interleaves all kinds sorted by time.
    assert data.num_events == 7


def test_from_pandas_static_features():
    static_df = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": [0.0] * 4})
    data = DGData.from_pandas(
        _edge_df(), "u", "v", "t",
        static_node_x_df=static_df, static_node_x_col=["a", "b"],
        time_delta="s",
    )
    assert data.static_node_x.shape == (4, 2)
    np.testing.assert_allclose(data.static_node_x[:, 0], [1, 2, 3, 4])


def test_from_pandas_missing_node_cols_raises():
    node_df = pd.DataFrame({"nid": [1], "t": [2]})
    with pytest.raises((ValueError, KeyError, TypeError)):
        DGData.from_pandas(
            _edge_df(), "u", "v", "t",
            node_x_df=node_df,  # nids/time col names not specified
            time_delta="s",
        )


# --------------------------------------------------------------------- #
# discretize
# --------------------------------------------------------------------- #
def test_discretize_keeps_first_per_bucket_with_node_events():
    # Two edges of the same (src, dst) inside one day bucket: keep first.
    data = DGData.from_raw(
        edge_time=np.array([0, 3_600, 90_000, 100_000]),
        edge_index=np.array([[0, 1], [0, 1], [0, 1], [2, 3]]),
        edge_x=np.array([[1.0], [2.0], [3.0], [4.0]], np.float32),
        node_x_time=np.array([10, 7_200, 90_500]),
        node_x_nids=np.array([1, 1, 1]),
        node_x=np.array([[1.0], [2.0], [3.0]], np.float32),
        time_delta="s",
    )
    disc = data.discretize("D")
    # Edges: day 0 keeps (0,1)@first with feat 1.0; day 1 keeps (0,1)@3.0 and (2,3).
    assert disc.num_edge_events == 3
    np.testing.assert_allclose(sorted(disc.edge_x[:, 0]), [1.0, 3.0, 4.0])
    # Node events: node 1 has two day-0 events -> keep first (feat 1.0).
    assert len(disc.node_x_nids) == 2
    np.testing.assert_allclose(sorted(disc.node_x[:, 0]), [1.0, 3.0])


def test_discretize_huge_ids_no_overflow():
    big = 2_000_000
    data = DGData.from_raw(
        edge_time=np.array([0, 3600]),
        edge_index=np.array([[big - 1, big - 2], [big - 2, big - 1]]),
        time_delta="s",
    )
    disc = data.discretize("D")
    assert disc.num_edge_events == 2  # distinct (src,dst) pairs both kept


def test_discretize_identity_and_errors():
    data = DGData.from_raw(
        edge_time=np.array([1, 2]), edge_index=np.array([[0, 1], [1, 0]]),
        time_delta="s",
    )
    same = data.discretize("s")
    assert same.num_events == data.num_events
    ro = DGData.from_raw(
        edge_time=np.array([1, 2]), edge_index=np.array([[0, 1], [1, 0]]),
        time_delta="r",
    )
    with pytest.raises(EventOrderedConversionError):
        ro.discretize("D")


# --------------------------------------------------------------------- #
# type-field validation
# --------------------------------------------------------------------- #
def test_bad_edge_type_shape_rejected():
    with pytest.raises((ValueError, Exception)):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 0]]),
            edge_type=np.array([0]),  # wrong length
            time_delta="s",
        )


def test_bad_node_type_shape_rejected():
    with pytest.raises((ValueError, Exception)):
        DGData.from_raw(
            edge_time=np.array([1, 2]),
            edge_index=np.array([[0, 1], [1, 0]]),
            node_type=np.array([0]),  # fewer rows than num_nodes
            time_delta="s",
        )


# --------------------------------------------------------------------- #
# split dispatch
# --------------------------------------------------------------------- #
def _stream(E=30):
    return DGData.from_raw(
        edge_time=np.arange(E),
        edge_index=np.stack([np.arange(E) % 4, (np.arange(E) + 1) % 4], 1),
        time_delta="s",
    )


def test_split_default_is_temporal_ratio():
    tr, va, te = _stream().split()
    assert tr.num_events > va.num_events
    assert tr.num_events + va.num_events + te.num_events == 30


def test_split_with_explicit_strategy():
    tr, va, te = _stream().split(TemporalSplit(val_time=10, test_time=20))
    assert tr.num_events == 10 and va.num_events == 10 and te.num_events == 10
    # Child splits record their global edge offsets for eid consumers.
    assert tr.edge_global_offset == 0
    assert va.edge_global_offset == 10
    assert te.edge_global_offset == 20


def test_tgb_split_cannot_be_overridden():
    data = _stream()
    data._split_strategy = TGBSplit(
        {"train": (0, 9), "val": (10, 19), "test": (20, 29)}
    )
    data.split()  # attached strategy works
    with pytest.raises(ValueError):
        data.split(TemporalRatioSplit())
