"""Dataloader iteration throughput (mirrors
/root/reference/test/performance/test_iteration.py:64-129: 6 hook configs ×
batch {200 events, 1 day}, reported in M events/sec).

The reference benchmarks its host loop (loader + hooks per batch). Here each
config runs through the same advertised API (`DGDataLoader` +
`HookManager`); the scanned-epoch path that fuses the whole pipeline into one
XLA program is benchmarked separately by bench.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pytest

from .conftest import DATASETS, measure


def _create_hook_manager(hooks):
    from tgm_tpu.hooks import HookManager

    hm = HookManager(keys=[""])
    for hook in hooks:
        hm.register("", hook)
    hm.set_active_hooks("")
    return hm


def setup_no_hooks(dg, data):
    return None


def setup_random_negs(dg, data):
    from tgm_tpu.hooks import RandomNegativeEdgeSamplerHook

    dst = np.asarray(dg.edge_dst)
    return _create_hook_manager(
        [RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max()))]
    )


def setup_tgb_negs(dg, data, sampler_type=None, num_nbrs=None):
    """TGB candidate-list negatives (synthetic (E, 20) candidate array — the
    tgb package is absent) plus an optional neighbor sampler, exactly the
    reference's config matrix."""
    from tgm_tpu.hooks import (
        NeighborSamplerHook,
        RecencyNeighborHook,
        TGBNegativeEdgeSamplerHook,
    )

    rng = np.random.default_rng(1)
    cands = rng.integers(0, dg.num_nodes, (dg.num_events, 20)).astype(np.int32)
    hooks = [TGBNegativeEdgeSamplerHook(candidates=cands)]
    seed_nodes_keys = ["edge_src", "edge_dst", "neg"]
    seed_times_keys = ["edge_time", "edge_time", "neg_time"]

    if sampler_type == "recency":
        hooks.append(
            RecencyNeighborHook(
                num_nodes=dg.num_nodes,
                num_nbrs=num_nbrs,
                seed_nodes_keys=seed_nodes_keys,
                seed_times_keys=seed_times_keys,
            )
        )
    elif sampler_type == "uniform":
        hooks.append(
            NeighborSamplerHook(
                num_nbrs=num_nbrs,
                seed_nodes_keys=seed_nodes_keys,
                seed_times_keys=seed_times_keys,
            )
        )
    return _create_hook_manager(hooks)


HOOK_CONFIGS = {
    "No Hooks": setup_no_hooks,
    "RandomNegatives": setup_random_negs,
    "TGBNegatives": setup_tgb_negs,
    "TGBNegatives + UniformNeighborSampler[20]": partial(
        setup_tgb_negs, sampler_type="uniform", num_nbrs=[20]
    ),
    "TGBNegatives + RecencyNeighborSampler[20]": partial(
        setup_tgb_negs, sampler_type="recency", num_nbrs=[20]
    ),
    "TGBNegatives + RecencyNeighborSampler[20, 20]": partial(
        setup_tgb_negs, sampler_type="recency", num_nbrs=[20, 20]
    ),
}


@pytest.mark.parametrize("dataset", [d[0] for d in DATASETS])
@pytest.mark.parametrize("batch_size", [200, "D"])
@pytest.mark.parametrize("hook_key", list(HOOK_CONFIGS.keys()))
def test_data_loader_hooks(dataset, batch_size, hook_key, preloaded_graphs):
    from tgm_tpu import DGDataLoader, DGraph

    full_data = preloaded_graphs[dataset]
    _, data, _ = full_data.split()
    dg = DGraph(data)
    hook_manager = HOOK_CONFIGS[hook_key](dg, full_data)

    if isinstance(batch_size, int):
        loader = DGDataLoader(dg, batch_size=batch_size, hook_manager=hook_manager)
    else:
        loader = DGDataLoader(dg, batch_unit=batch_size, hook_manager=hook_manager)

    def run_full_loader():
        for batch in loader:
            pass

    best = measure(run_full_loader)
    throughput = (dg.num_events / best) / 1e6
    print(
        f"{dataset} | batch={batch_size} | hooks={hook_key} -> "
        f"{throughput:.6f} M events/sec"
    )
    assert throughput > 0
