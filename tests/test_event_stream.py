"""DeviceEventStream must reproduce the loader's materialized batches exactly."""

import jax.numpy as jnp
import numpy as np

from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.data.dg_data import DGData
from tgm_tpu.train import DeviceEventStream


def build_data(rng, N=30, E=200, NX=40, NY=25, D=3, C=4):
    t_all = np.sort(rng.integers(0, 1000, E + NX + NY))
    return DGData.from_raw(
        edge_time=t_all[:E],
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        node_x_time=t_all[E:E + NX],
        node_x_nids=rng.integers(0, N, NX),
        node_x=rng.normal(size=(NX, D)).astype(np.float32),
        node_y_time=t_all[E + NX:],
        node_y_nids=rng.integers(0, N, NY),
        node_y=rng.normal(size=(NY, C)).astype(np.float32),
        time_delta="s",
    )


def assert_batches_match(loader, stream):
    eager = list(loader)
    assert stream.num_batches >= len(eager)  # stream keeps empty batches
    si = 0
    for b in eager:
        # Advance over batches the eager loader skipped as empty.
        while True:
            s = stream.batch_at(si)
            si += 1
            if bool(s.edge_valid.any()) or (
                s.node_x_valid is not None and bool(s.node_x_valid.any())
            ) or (s.node_y_valid is not None and bool(s.node_y_valid.any())):
                break
        for attr in ("edge_src", "edge_dst", "edge_time", "edge_valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s, attr)), np.asarray(getattr(b, attr)), err_msg=attr
            )
        np.testing.assert_allclose(np.asarray(s.edge_x), np.asarray(b.edge_x), err_msg="edge_x")
        for attr in ("node_x_time", "node_x_nids", "node_x", "node_x_valid",
                     "node_y_time", "node_y_nids", "node_y", "node_y_valid"):
            w = getattr(b, attr)
            if w is None:
                continue
            np.testing.assert_allclose(
                np.asarray(getattr(s, attr)), np.asarray(w), err_msg=attr
            )


def test_event_stream_matches_loader_event_ordered():
    rng = np.random.default_rng(0)
    dg = DGraph(build_data(rng))
    loader = DGDataLoader(dg, 37)
    assert_batches_match(loader, DeviceEventStream(loader))


def test_event_stream_matches_loader_time_ordered():
    rng = np.random.default_rng(1)
    dg = DGraph(build_data(rng))
    loader = DGDataLoader(dg, 100, batch_unit="s")
    assert_batches_match(loader, DeviceEventStream(loader))


def test_event_stream_edge_ids_reference_edge_x():
    rng = np.random.default_rng(2)
    dg = DGraph(build_data(rng))
    loader = DGDataLoader(dg, 64)
    stream = DeviceEventStream(loader)
    b = stream.batch_at(jnp.asarray(1))
    ids = np.asarray(b.edge_ids)
    valid = np.asarray(b.edge_valid)
    assert np.all(ids[valid] >= 0) and np.all(ids[~valid] == -1)
    np.testing.assert_allclose(
        np.asarray(stream.edge_x)[ids[valid]], np.asarray(b.edge_x)[valid]
    )
