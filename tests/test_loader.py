import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.exceptions import EventOrderedConversionError, InvalidDiscretizationError


def make_graph(tiny_events, time_delta="r"):
    edge_time, edge_index, edge_x = tiny_events
    data = DGData.from_raw(
        edge_time=edge_time, edge_index=edge_index, edge_x=edge_x, time_delta=time_delta
    )
    return DGraph(data)


def test_event_ordered_batches(tiny_events):
    dg = make_graph(tiny_events)
    loader = DGDataLoader(dg, batch_size=3, pad_multiple=1)
    batches = list(loader)
    assert len(batches) == 3
    np.testing.assert_array_equal(np.asarray(batches[0].edge_time), [1, 1, 2])
    np.testing.assert_array_equal(np.asarray(batches[1].edge_time), [5, 5, 8])
    # last batch padded to same width
    assert batches[2].edge_src.shape == batches[0].edge_src.shape
    np.testing.assert_array_equal(np.asarray(batches[2].edge_valid), [1, 1, 0])


def test_time_ordered_batches(tiny_events):
    dg = make_graph(tiny_events, time_delta="s")
    loader = DGDataLoader(dg, batch_size=10, batch_unit="s", pad_multiple=1)
    batches = list(loader)
    assert len(batches) == 2
    assert int(batches[0].num_valid_edges) == 7
    assert int(batches[1].num_valid_edges) == 1


def test_time_ordered_skips_empty(tiny_events):
    dg = make_graph(tiny_events, time_delta="s")
    loader = DGDataLoader(dg, batch_size=3, batch_unit="s", pad_multiple=1)
    # windows: [1,4) [4,7) [7,10) [10,13) [13,16) [16,19) [19,22)
    batches = list(loader)
    counts = [int(b.num_valid_edges) for b in batches]
    assert counts == [3, 2, 2, 1]  # empty windows skipped


def test_on_empty_raise(tiny_events):
    from tgm_tpu.exceptions import EmptyBatchError

    dg = make_graph(tiny_events, time_delta="s")
    loader = DGDataLoader(dg, batch_size=3, batch_unit="s", on_empty="raise", pad_multiple=1)
    with pytest.raises(EmptyBatchError):
        list(loader)


def test_unit_conversion(tiny_events):
    dg = make_graph(tiny_events, time_delta="s")
    loader = DGDataLoader(dg, batch_size=1, batch_unit="m")
    assert loader.batch_size == 60


def test_coarser_graph_rejected(tiny_events):
    dg = make_graph(tiny_events, time_delta="h")
    with pytest.raises(InvalidDiscretizationError):
        DGDataLoader(dg, batch_size=1, batch_unit="m")


def test_event_graph_time_batching_rejected(tiny_events):
    dg = make_graph(tiny_events, time_delta="r")
    with pytest.raises(EventOrderedConversionError):
        DGDataLoader(dg, batch_size=1, batch_unit="s")


def test_static_shapes_across_batches(tiny_events):
    dg = make_graph(tiny_events)
    loader = DGDataLoader(dg, batch_size=3)
    shapes = {b.edge_src.shape for b in loader}
    assert len(shapes) == 1


def test_loader_on_sliced_graph(tiny_events):
    dg = make_graph(tiny_events).slice_events(2, 7)
    loader = DGDataLoader(dg, batch_size=2, pad_multiple=1)
    batches = list(loader)
    total = sum(int(b.num_valid_edges) for b in batches)
    assert total == 5
    np.testing.assert_array_equal(np.asarray(batches[0].edge_time), [2, 5])
