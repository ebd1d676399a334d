import numpy as np

from tgm_tpu import DGData, DGraph
from tgm_tpu.constants import PADDED_NODE_ID


def make_graph(tiny_events, **kw):
    edge_time, edge_index, edge_x = tiny_events
    data = DGData.from_raw(edge_time=edge_time, edge_index=edge_index, edge_x=edge_x, **kw)
    return DGraph(data)


def test_properties(tiny_events):
    dg = make_graph(tiny_events)
    assert dg.num_edge_events == 8
    assert dg.num_events == 8
    assert dg.num_nodes == 4
    assert dg.start_time == 1
    assert dg.end_time == 20
    assert dg.num_timestamps == 6
    assert dg.edge_x_dim == 2
    assert len(dg) == 6


def test_slice_time(tiny_events):
    dg = make_graph(tiny_events)
    s = dg.slice_time(2, 9)  # end-exclusive
    np.testing.assert_array_equal(s.edge_time, [2, 5, 5, 8])
    assert s.start_time == 2
    assert s.end_time == 8
    assert s.num_nodes == 4


def test_slice_events(tiny_events):
    dg = make_graph(tiny_events)
    s = dg.slice_events(2, 5)
    np.testing.assert_array_equal(s.edge_time, [2, 5, 5])
    np.testing.assert_array_equal(s.edge_src, [2, 3, 1])


def test_nested_slices_intersect(tiny_events):
    dg = make_graph(tiny_events)
    s = dg.slice_time(2, 21).slice_time(1, 9)
    np.testing.assert_array_equal(s.edge_time, [2, 5, 5, 8])
    s2 = dg.slice_events(1, 6).slice_events(3, 8)
    np.testing.assert_array_equal(s2.edge_time, [5, 5, 8])


def test_materialize(tiny_events):
    dg = make_graph(tiny_events)
    b = dg.slice_time(2, 9).materialize()
    np.testing.assert_array_equal(np.asarray(b.edge_time), [2, 5, 5, 8])
    np.testing.assert_array_equal(np.asarray(b.edge_src), [2, 3, 1, 0])
    assert b.edge_x.shape == (4, 2)
    assert bool(b.edge_valid.all())


def test_materialize_padded(tiny_events):
    dg = make_graph(tiny_events)
    b = dg.slice_time(2, 9).materialize(pad_edges_to=6)
    assert b.edge_src.shape == (6,)
    np.testing.assert_array_equal(np.asarray(b.edge_valid), [1, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(b.edge_src)[4:], [PADDED_NODE_ID] * 2)
    assert int(b.num_valid_edges) == 4


def test_empty_slice(tiny_events):
    dg = make_graph(tiny_events)
    s = dg.slice_time(10, 20)
    assert s.num_edge_events == 0
    assert s.start_time is None
    assert s.num_nodes == 0


def test_storage_get_nbrs(tiny_events):
    dg = make_graph(tiny_events)
    # neighbors of node 1 before time 6 (inclusive): edges (0,1)@1, (1,2)@1, (1,3)@5
    nbr_nids, nbr_times, nbr_feats = dg._storage.get_nbrs(
        np.array([1]), num_nbrs=5, slice=type(dg._slice)(end_time=6), directed=False
    )
    assert nbr_nids.shape == (1, 5)
    np.testing.assert_array_equal(nbr_nids[0, :3], [0, 2, 3])
    np.testing.assert_array_equal(nbr_times[0, :3], [1, 1, 5])
    np.testing.assert_array_equal(nbr_nids[0, 3:], [PADDED_NODE_ID] * 2)
    assert nbr_feats.shape == (1, 5, 2)


def test_storage_get_nbrs_directed(tiny_events):
    dg = make_graph(tiny_events)
    nbr_nids, _, _ = dg._storage.get_nbrs(
        np.array([1]), num_nbrs=5, slice=type(dg._slice)(end_time=20), directed=True
    )
    # directed: only src->dst edges from node 1: (1,2)@1, (1,3)@5
    np.testing.assert_array_equal(nbr_nids[0, :2], [2, 3])
    assert nbr_nids[0, 2] == PADDED_NODE_ID


def test_storage_get_nbrs_subsample(tiny_events):
    dg = make_graph(tiny_events)
    nbr_nids, nbr_times, _ = dg._storage.get_nbrs(
        np.array([1, 1, 2]), num_nbrs=2, slice=type(dg._slice)(end_time=20), directed=False
    )
    assert (nbr_nids != PADDED_NODE_ID).sum() == 6  # all rows full
    # sampled times must be ascending within each row (we sort draws)
    for row in nbr_times:
        assert row[0] <= row[1]
