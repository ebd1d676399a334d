import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph


def make_graph_with_labels():
    rng = np.random.default_rng(0)
    E = 60
    t = np.sort(rng.integers(0, 300, E))
    data = DGData.from_raw(
        edge_time=t,
        edge_index=rng.integers(0, 10, (E, 2)),
        edge_x=rng.normal(size=(E, 3)).astype(np.float32),
        node_y_time=np.sort(rng.integers(0, 300, 9)),
        node_y_nids=rng.integers(0, 10, 9),
        node_y=np.ones((9, 2), dtype=np.float32),
        time_delta="s",
    )
    return DGraph(data)


def test_loader_emits_node_labels_with_uniform_widths():
    dg = make_graph_with_labels()
    loader = DGDataLoader(dg, batch_size=16)
    widths = set()
    total_labels = 0
    for b in loader:
        assert b.node_y is not None
        widths.add(b.node_y_nids.shape[0])
        total_labels += int(np.asarray(b.node_y_valid).sum())
    assert len(widths) == 1  # static across epoch
    assert total_labels == 9


def test_drop_last():
    dg = make_graph_with_labels()
    full = DGDataLoader(dg, batch_size=16, drop_last=False)
    dropped = DGDataLoader(dg, batch_size=16, drop_last=True)
    assert len(dropped) < len(full)


def test_pad_multiple_rounds_up():
    dg = make_graph_with_labels()
    loader = DGDataLoader(dg, batch_size=10, pad_multiple=8)
    b = next(iter(loader))
    assert b.edge_src.shape[0] % 8 == 0


def test_time_batching_with_labels():
    dg = make_graph_with_labels()
    loader = DGDataLoader(dg, batch_size=50, batch_unit="s", pad_multiple=1)
    total_edges, total_labels = 0, 0
    for b in loader:
        total_edges += int(np.asarray(b.edge_valid).sum())
        if b.node_y_valid is not None:
            total_labels += int(np.asarray(b.node_y_valid).sum())
    assert total_edges == 60
    assert total_labels == 9


def test_batch_str_mentions_shapes():
    dg = make_graph_with_labels()
    b = next(iter(DGDataLoader(dg, batch_size=16)))
    s = str(b)
    assert "edge_src" in s and "node_y" in s


def test_hook_has_state_flags():
    from tgm_tpu.hooks import (
        BatchAnalyticsHook,
        DeduplicationHook,
        HistoricalNegativeEdgeSamplerHook,
        PinMemoryHook,
        RecencyNeighborHook,
    )

    assert RecencyNeighborHook(4, [2], ["edge_src"], ["edge_time"]).has_state
    assert HistoricalNegativeEdgeSamplerHook().has_state
    assert not DeduplicationHook(4).has_state
    assert not BatchAnalyticsHook().has_state
    assert not PinMemoryHook().has_state


def test_bad_batch_size_and_on_empty_validation():
    data = DGData.from_raw(
        edge_time=np.array([1, 2]), edge_index=np.array([[0, 1], [1, 2]]),
        time_delta="s",
    )
    dg = DGraph(data)
    with pytest.raises(ValueError):
        DGDataLoader(dg, batch_size=0)
    with pytest.raises(ValueError):
        DGDataLoader(dg, batch_size=-5)
    with pytest.raises(ValueError):
        DGDataLoader(dg, batch_size=2, on_empty="explode")


def test_on_empty_none_yields_empty_batches():
    # Time batching over a gap: on_empty=None passes empty batches through.
    data = DGData.from_raw(
        edge_time=np.array([0, 1, 50, 51]),
        edge_index=np.array([[0, 1], [1, 2], [2, 3], [3, 0]]),
        time_delta="s",
    )
    dg = DGraph(data)
    loader = DGDataLoader(dg, batch_size=10, batch_unit="s", on_empty=None)
    batches = list(loader)
    kinds = [int(b.edge_valid.sum()) for b in batches]
    assert 0 in kinds  # at least one empty window crossed the gap
    assert sum(kinds) == 4  # all real edges still served exactly once


def test_node_event_only_stream_iterates():
    # A graph with node events but no edges in some windows still iterates.
    data = DGData.from_raw(
        edge_time=np.array([0, 40]),
        edge_index=np.array([[0, 1], [1, 2]]),
        node_x_time=np.array([5, 20]),
        node_x_nids=np.array([0, 2]),
        node_x=np.ones((2, 2), np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    loader = DGDataLoader(dg, batch_size=10, batch_unit="s", on_empty="skip")
    batches = list(loader)
    served_edges = sum(int(b.edge_valid.sum()) for b in batches)
    assert served_edges == 2
    served_nodes = sum(
        int(b.node_x_valid.sum()) for b in batches if b.node_x_valid is not None
    )
    assert served_nodes == 2
