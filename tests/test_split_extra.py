import numpy as np
import pytest

from tgm_tpu import DGData
from tgm_tpu.data import TemporalRatioSplit, TemporalSplit, TGBSplit


def make(times, with_labels=False):
    n = len(times)
    kwargs = {}
    if with_labels:
        kwargs = dict(
            node_y_time=np.asarray(times[: n // 2]),
            node_y_nids=np.zeros(n // 2, dtype=np.int64),
            node_y=np.ones((n // 2, 2), dtype=np.float32),
        )
    return DGData.from_raw(
        edge_time=np.asarray(times),
        edge_index=np.stack([np.zeros(n, np.int64), np.ones(n, np.int64)], 1),
        time_delta="s",
        **kwargs,
    )


def test_temporal_split_validation():
    with pytest.raises(ValueError):
        TemporalSplit(val_time=5, test_time=3)
    with pytest.raises(ValueError):
        TemporalSplit(val_time=-1, test_time=3)


def test_ratio_split_validation():
    with pytest.raises(ValueError):
        TemporalRatioSplit(0.5, 0.5, 0.5)
    with pytest.raises(ValueError):
        TemporalRatioSplit(-0.1, 0.6, 0.5)


def test_tgb_split_inclusive_bounds():
    d = make([1, 2, 3, 4, 5, 6])
    tr, va, te = TGBSplit({"train": (1, 3), "val": (4, 5), "test": (6, 6)}).apply(d)
    np.testing.assert_array_equal(tr.edge_time, [1, 2, 3])
    np.testing.assert_array_equal(va.edge_time, [4, 5])
    np.testing.assert_array_equal(te.edge_time, [6])


def test_split_carries_node_labels():
    d = make([1, 2, 3, 4, 5, 6], with_labels=True)
    parts = d.split(TemporalSplit(val_time=4, test_time=6))
    train = parts[0]
    assert train.node_y is not None
    assert np.all(train.node_y_time < 4)


def test_split_shares_static_features():
    d = make([1, 2, 3, 4])
    d.static_node_x = np.ones((2, 3), dtype=np.float32)
    parts = d.split(TemporalSplit(val_time=3, test_time=4))
    # Shared (not cloned) across splits.
    assert parts[0].static_node_x is d.static_node_x


def test_default_split_is_ratio():
    d = make(list(range(100)))
    parts = d.split()
    assert len(parts) == 3
    assert parts[0].num_edge_events == 70
