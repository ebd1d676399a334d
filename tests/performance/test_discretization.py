"""Discretization throughput (mirrors
/root/reference/test/performance/test_discretization.py:8-27: second-grain
datasets bucketed to D/M/Y, in M events/sec)."""

from __future__ import annotations

import pytest

from .conftest import DATASETS, measure


@pytest.mark.parametrize("dataset", [d[0] for d in DATASETS])
@pytest.mark.parametrize("granularity", ["D", "M", "Y"])
def test_graph_discretization(dataset, granularity, preloaded_graphs):
    from tgm_tpu import DGraph

    data = preloaded_graphs[dataset]
    dg = DGraph(data)
    best = measure(lambda: data.discretize(granularity))
    throughput = (dg.num_events / best) / 1e6
    print(f"{dataset} discretization ({granularity}): {throughput:.3f} M events/sec")
    assert throughput > 0
