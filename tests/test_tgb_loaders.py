"""Exercise the from_tgb / from_tgb_seq load paths under faithful stubs.

The ``tgb`` / ``tgb_seq`` packages are not installed in this image, so these
loaders were previously never executed. The stubs below expose exactly the
dataset interface the loaders consume (reference contract:
/root/reference/tgm/data/dg_data.py:976-1188) with tiny synthetic payloads,
covering tgbl (edge feats), tgbn (node-label dict flattening), tkgl
(edge-feature doubling + edge types), thgl (edge/node types) and tgb-seq.
"""

import sys
import types

import numpy as np
import pytest

from tgm_tpu import DGData
from tgm_tpu.data.split import TGBSplit


def _install_tgb_stub(make_link_dataset=None, make_node_dataset=None):
    tgb = types.ModuleType("tgb")
    lp = types.ModuleType("tgb.linkproppred")
    lpd = types.ModuleType("tgb.linkproppred.dataset")
    npp = types.ModuleType("tgb.nodeproppred")
    npd = types.ModuleType("tgb.nodeproppred.dataset")
    if make_link_dataset is not None:
        lpd.LinkPropPredDataset = make_link_dataset
    if make_node_dataset is not None:
        npd.NodePropPredDataset = make_node_dataset
    if make_link_dataset is None:
        lpd.LinkPropPredDataset = lambda **k: (_ for _ in ()).throw(AssertionError)
    if make_node_dataset is None:
        npd.NodePropPredDataset = lambda **k: (_ for _ in ()).throw(AssertionError)
    sys.modules["tgb"] = tgb
    sys.modules["tgb.linkproppred"] = lp
    sys.modules["tgb.linkproppred.dataset"] = lpd
    sys.modules["tgb.nodeproppred"] = npp
    sys.modules["tgb.nodeproppred.dataset"] = npd


@pytest.fixture(autouse=True)
def _clean_stubs():
    yield
    for m in list(sys.modules):
        if m == "tgb" or m.startswith("tgb.") or m == "tgb_seq" or m.startswith("tgb_seq."):
            del sys.modules[m]


def _masks(E, train_end, val_end):
    tr = np.zeros(E, bool); tr[:train_end] = True
    va = np.zeros(E, bool); va[train_end:val_end] = True
    te = np.zeros(E, bool); te[val_end:] = True
    return tr, va, te


def test_from_tgb_link_dataset():
    E = 12
    t = np.arange(10, 10 + E)
    feats = np.random.default_rng(0).normal(size=(E, 5)).astype(np.float64)
    tr, va, te = _masks(E, 8, 10)

    class FakeLink:
        def __init__(self, name):
            assert name == "tgbl-wiki"
            self.full_data = {
                "sources": np.arange(E) % 4,
                "destinations": (np.arange(E) + 1) % 4,
                "timestamps": t,
                "edge_feat": feats,
            }
            self.train_mask, self.val_mask, self.test_mask = tr, va, te
            self.node_feat = None

    _install_tgb_stub(make_link_dataset=lambda name: FakeLink(name))
    data = DGData.from_tgb("tgbl-wiki")
    assert data.num_events == E
    np.testing.assert_allclose(data.edge_x, feats.astype(np.float32))
    assert isinstance(data._split_strategy, TGBSplit)
    train, val, test = data.split()
    assert train.num_events == 8 and val.num_events == 2 and test.num_events == 2
    # TGB splits are un-overridable.
    with pytest.raises(Exception):
        data.split(strategy="temporal_ratio")


def test_from_tgb_node_dataset_label_flattening():
    E = 10
    t = np.arange(1, 1 + E)
    tr, va, te = _masks(E, 6, 8)
    # node_label_dict: {time -> {node -> label-vector}}; labels outside
    # (t0-1, t_last) are dropped (reference dg_data.py:1031-1068).
    label_dict = {
        3: {0: np.array([1.0, 0.0]), 2: np.array([0.0, 1.0])},
        7: {1: np.array([0.5, 0.5])},
        999: {0: np.array([9.9, 9.9])},  # out of range: dropped
    }

    class FakeNode:
        def __init__(self, name):
            assert name == "tgbn-trade"
            self.full_data = {
                "sources": np.arange(E) % 3,
                "destinations": (np.arange(E) + 1) % 3,
                "timestamps": t,
                "edge_feat": None,
                "node_label_dict": label_dict,
            }
            self.train_mask, self.val_mask, self.test_mask = tr, va, te
            self.node_feat = None

    _install_tgb_stub(make_node_dataset=lambda name: FakeNode(name))
    data = DGData.from_tgb("tgbn-trade")
    assert data.node_y is not None
    assert data.node_y.shape == (3, 2)
    np.testing.assert_array_equal(np.sort(data.node_y_nids), [0, 1, 2])
    assert data.time_delta.unit == "Y"


def test_from_tgb_tkgl_doubles_edge_feat():
    E = 6  # dataset serves 2E edges (inverse relations), E feature rows
    t = np.repeat(np.arange(1, E + 1), 2)
    feats = np.random.default_rng(1).normal(size=(E, 3)).astype(np.float32)
    tr, va, te = _masks(2 * E, 8, 10)

    class FakeTKG:
        def __init__(self, name):
            self.full_data = {
                "sources": np.arange(2 * E) % 5,
                "destinations": (np.arange(2 * E) + 2) % 5,
                "timestamps": t,
                "edge_feat": feats,
                "edge_type": np.arange(2 * E) % 4,
            }
            self.train_mask, self.val_mask, self.test_mask = tr, va, te
            self.node_feat = None

    _install_tgb_stub(make_link_dataset=lambda name: FakeTKG(name))
    data = DGData.from_tgb("tkgl-polecat")
    assert data.num_events == 2 * E
    assert data.edge_x.shape == (2 * E, 3)
    np.testing.assert_allclose(data.edge_x[:E], data.edge_x[E:])
    assert data.edge_type is not None


def test_from_tgb_thgl_types():
    E = 8
    t = np.arange(1, E + 1)
    tr, va, te = _masks(E, 5, 7)

    class FakeTHG:
        def __init__(self, name):
            self.full_data = {
                "sources": np.arange(E) % 4,
                "destinations": (np.arange(E) + 1) % 4,
                "timestamps": t,
                "edge_feat": None,
                "edge_type": np.arange(E) % 3,
            }
            self.train_mask, self.val_mask, self.test_mask = tr, va, te
            self.node_feat = None
            self.node_type = np.array([0, 0, 1, 1])

    _install_tgb_stub(make_link_dataset=lambda name: FakeTHG(name))
    data = DGData.from_tgb("thgl-software")
    assert data.edge_type is not None and data.node_type is not None
    np.testing.assert_array_equal(data.node_type, [0, 0, 1, 1])


def test_from_tgb_seq():
    E = 10
    t = np.arange(1, E + 1).astype(np.float64)
    tr, va, te = _masks(E, 6, 8)

    class FakeSeq:
        def __init__(self, name, root=None):
            assert name == "GoogleLocal"
            self.src_node_ids = np.arange(E) % 4
            self.dst_node_ids = (np.arange(E) + 1) % 4
            self.node_interact_times = t
            self.edge_features = None
            self.node_features = None
            self.train_mask, self.val_mask, self.test_mask = tr, va, te

    tgb_seq = types.ModuleType("tgb_seq")
    lpk = types.ModuleType("tgb_seq.LinkPred")
    dl = types.ModuleType("tgb_seq.LinkPred.dataloader")
    dl.TGBSeqLoader = lambda name, root=None: FakeSeq(name, root)
    sys.modules["tgb_seq"] = tgb_seq
    sys.modules["tgb_seq.LinkPred"] = lpk
    sys.modules["tgb_seq.LinkPred.dataloader"] = dl

    data = DGData.from_tgb_seq("GoogleLocal")
    assert data.num_events == E
    train, val, test = data.split()
    assert train.num_events == 6 and val.num_events == 2 and test.num_events == 2
