"""Graph construction / split throughput (mirrors
/root/reference/test/performance/test_construction.py:9-52), in M events/sec.

The reference times `DGData.from_tgb` (disk load + validation + sort); the
tgb package is absent here, so loading is timed through `DGData.from_raw`
on the same shapes (validation + native radix sort — the identical code path
minus disk IO).
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import DATASETS, build_raw, measure


@pytest.mark.parametrize("dataset", [d[0] for d in DATASETS])
def test_graph_loading(dataset, preloaded_graphs):
    from tgm_tpu import DGData, DGraph

    raw = build_raw(dataset)
    out = {}

    def run():
        out["dg"] = DGraph(DGData.from_raw(**raw))

    best = measure(run)
    num_events = out["dg"].num_events
    throughput = (num_events / best) / 1e6
    print(f"{dataset} loading throughput: {throughput:.3f} M events/sec")
    assert throughput > 0


@pytest.mark.parametrize("dataset", [d[0] for d in DATASETS])
def test_graph_split(dataset, preloaded_graphs):
    from tgm_tpu import DGraph

    data = preloaded_graphs[dataset]
    dg = DGraph(data)
    best = measure(lambda: data.split())
    throughput = (dg.num_events / best) / 1e6
    print(f"{dataset} split throughput: {throughput:.3f} M events/sec")
    assert throughput > 0
