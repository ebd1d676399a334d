"""Uniform neighbor sampling parity vs the reference storage backend."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    from tests.test_reference_parity import _stub_pyg

    _stub_pyg()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import tgm  # noqa: F401

    return sys.modules["tgm"]


def test_uniform_nbrs_match_when_under_capacity(ref):
    """deg <= k: both return all neighbors (deterministic) — exact match."""
    from tgm.core import DGraph as RefDGraph
    from tgm.core._storage.base import DGSliceTracker as RefSlice
    from tgm.data import DGData as RefDGData

    from tgm_tpu import DGData, DGraph
    from tgm_tpu.core import DGSliceTracker

    rng = np.random.default_rng(5)
    N, E, D = 10, 40, 2
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    t = np.sort(rng.integers(0, 200, E)).astype(np.int64)
    x = rng.normal(size=(E, D)).astype(np.float32)

    ref_dg = RefDGraph(
        RefDGData.from_raw(
            edge_time=torch.from_numpy(t),
            edge_index=torch.from_numpy(np.stack([src, dst], 1)),
            edge_x=torch.from_numpy(x),
        )
    )
    ours = DGraph(DGData.from_raw(edge_time=t, edge_index=np.stack([src, dst], 1), edge_x=x))

    k = E * 2 + 1  # over-capacity => both emit the full neighborhood in order
    seeds = np.arange(N, dtype=np.int64)
    for end_time in (50, 120, 199):
        want_ids, want_t, want_x = ref_dg._storage.get_nbrs(
            torch.from_numpy(seeds), num_nbrs=k,
            slice=RefSlice(end_time=end_time), directed=False,
        )
        got_ids, got_t, got_x = ours._storage.get_nbrs(
            seeds, num_nbrs=k, slice=DGSliceTracker(end_time=end_time), directed=False
        )
        np.testing.assert_array_equal(got_ids, want_ids.numpy())
        np.testing.assert_array_equal(got_t, want_t.numpy())
        np.testing.assert_allclose(got_x, want_x.numpy(), atol=1e-6)


def test_uniform_nbrs_directed_parity(ref):
    from tgm.core import DGraph as RefDGraph
    from tgm.core._storage.base import DGSliceTracker as RefSlice
    from tgm.data import DGData as RefDGData

    from tgm_tpu import DGData, DGraph
    from tgm_tpu.core import DGSliceTracker

    rng = np.random.default_rng(9)
    N, E = 8, 30
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    t = np.sort(rng.integers(0, 100, E)).astype(np.int64)

    ref_dg = RefDGraph(
        RefDGData.from_raw(
            edge_time=torch.from_numpy(t),
            edge_index=torch.from_numpy(np.stack([src, dst], 1)),
        )
    )
    ours = DGraph(DGData.from_raw(edge_time=t, edge_index=np.stack([src, dst], 1)))

    seeds = np.arange(N, dtype=np.int64)
    want_ids, want_t, _ = ref_dg._storage.get_nbrs(
        torch.from_numpy(seeds), num_nbrs=E + 1,
        slice=RefSlice(end_time=99), directed=True,
    )
    got_ids, got_t, _ = ours._storage.get_nbrs(
        seeds, num_nbrs=E + 1, slice=DGSliceTracker(end_time=99), directed=True
    )
    np.testing.assert_array_equal(got_ids, want_ids.numpy())
    np.testing.assert_array_equal(got_t, want_t.numpy())
