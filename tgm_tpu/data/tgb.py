"""Gated loaders for the TGB / TGB-Seq benchmark packages.

Parity: reference ``DGData.from_tgb``/``from_tgb_seq``
(/root/reference/tgm/data/dg_data.py:976-1188): tgbl-/tgbn-/tkgl-/thgl-
families, node-label dict flattening, tkgl edge-feature doubling, thgl
edge/node types, and the official split bounds recorded as a ``TGBSplit``.

The ``tgb`` packages are optional; imports are deferred so the framework works
without them (synthetic and CSV data paths don't need TGB).
"""

from __future__ import annotations

from typing import Any, Union

import numpy as np

from ..timedelta import TGB_SEQ_TIME_DELTAS, TGB_TIME_DELTAS, TimeDeltaDG
from ..util.logging import _get_logger
from .split import TGBSplit

logger = _get_logger(__name__)


def load_tgb(
    cls, name: str, time_delta: Union[TimeDeltaDG, str, None] = None, **kwargs: Any
):
    try:
        from tgb.linkproppred.dataset import LinkPropPredDataset
        from tgb.nodeproppred.dataset import NodePropPredDataset
    except ImportError as e:
        raise ImportError("TGB required to load TGB data, try `pip install py-tgb`") from e

    if name.startswith(("tgbl-", "tkgl-", "thgl-")):
        dataset = LinkPropPredDataset(name=name, **kwargs)
    elif name.startswith("tgbn-"):
        dataset = NodePropPredDataset(name=name, **kwargs)
    else:
        raise ValueError(f"Unknown TGB dataset: {name}")

    data = dataset.full_data
    edge_index = np.stack(
        [data["sources"].astype(np.int64), data["destinations"].astype(np.int64)], axis=1
    )
    timestamps = data["timestamps"].astype(np.int64)

    edge_x = None
    if data.get("edge_feat") is not None:
        edge_x = data["edge_feat"].astype(np.float32)
        if name.startswith("tkgl-"):
            # tkgl datasets duplicate each relation's features for the inverse
            # relation (reference dg_data.py:1028-1029).
            edge_x = np.concatenate([edge_x, edge_x], axis=0)

    node_y_time = node_y_nids = node_y = None
    if name.startswith("tgbn-"):
        node_label_dict = data.get("node_label_dict")
        if node_label_dict is None:
            raise ValueError("TGB dataset missing node_label_dict; upgrade py-tgb")
        lo, hi = int(timestamps[0]) - 1, int(timestamps[-1])
        items = [(t, d) for t, d in node_label_dict.items() if lo <= t < hi]
        if items:
            ts, nids, labels = [], [], []
            for t, per_node in items:
                for node_id, label in per_node.items():
                    ts.append(t)
                    nids.append(node_id)
                    labels.append(np.asarray(label, dtype=np.float32))
            node_y_time = np.asarray(ts, dtype=np.int64)
            node_y_nids = np.asarray(nids, dtype=np.int64)
            node_y = np.stack(labels).astype(np.float32)

    static_node_x = None
    if getattr(dataset, "node_feat", None) is not None:
        static_node_x = np.asarray(dataset.node_feat, dtype=np.float32)

    edge_type = node_type = None
    if name.startswith("thgl"):
        edge_type = data["edge_type"].astype(np.int64)
        node_type = np.asarray(dataset.node_type, dtype=np.int64)
    elif name.startswith("tkgl"):
        edge_type = data["edge_type"].astype(np.int64)

    split_bounds = {}
    for split_name, mask in (
        ("train", dataset.train_mask),
        ("val", dataset.val_mask),
        ("test", dataset.test_mask),
    ):
        times = timestamps[np.asarray(mask, dtype=bool)]
        split_bounds[split_name] = (int(times.min()), int(times.max()))

    out = cls.from_raw(
        time_delta=time_delta or TGB_TIME_DELTAS[name],
        edge_time=timestamps,
        edge_index=edge_index,
        edge_x=edge_x,
        node_y_time=node_y_time,
        node_y_nids=node_y_nids,
        node_y=node_y,
        static_node_x=static_node_x,
        edge_type=edge_type,
        node_type=node_type,
    )
    out._split_strategy = TGBSplit(split_bounds)
    return out


def load_tgb_seq(
    cls, name: str, time_delta: Union[TimeDeltaDG, str, None] = None, **kwargs: Any
):
    try:
        from tgb_seq.LinkPred.dataloader import TGBSeqLoader
    except ImportError as e:
        raise ImportError("TGB-Seq required, try `pip install tgb-seq`") from e

    kwargs.setdefault("root", "./data")
    data = TGBSeqLoader(name=name, **kwargs)

    edge_index = np.stack(
        [data.src_node_ids.astype(np.int64), data.dst_node_ids.astype(np.int64)], axis=1
    )
    timestamps = data.node_interact_times.astype(np.int64)
    edge_x = None if data.edge_features is None else data.edge_features.astype(np.float32)
    static_node_x = None if data.node_features is None else data.node_features.astype(np.float32)

    split_bounds = {}
    for split_name, mask in (
        ("train", data.train_mask),
        ("val", data.val_mask),
        ("test", data.test_mask),
    ):
        times = data.node_interact_times[np.asarray(mask, dtype=bool)]
        split_bounds[split_name] = (int(times.min()), int(times.max()))

    out = cls.from_raw(
        time_delta=time_delta or TGB_SEQ_TIME_DELTAS[name],
        edge_time=timestamps,
        edge_index=edge_index,
        edge_x=edge_x,
        static_node_x=static_node_x,
    )
    out._split_strategy = TGBSplit(split_bounds)
    return out
