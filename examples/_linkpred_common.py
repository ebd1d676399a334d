"""Shared scaffolding for link-prediction examples.

The reference repeats this boilerplate per script; examples here share one
harness: dataset + splits, the train/val/test hook manager (random negatives
for train, TGB candidates for val/test), optional shared neighbor hooks, and
the epoch/eval drivers around user-provided jitted step functions.
"""

from __future__ import annotations

import argparse
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax.numpy as jnp
import numpy as np

from examples._datasets import load_dataset
from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.hooks import (
    HookManager,
    RandomNegativeEdgeSamplerHook,
    TGBNegativeEdgeSamplerHook,
)
from tgm_tpu.util import seed_everything


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    return p


@dataclass
class LinkPredSetup:
    data: DGData
    train_dg: DGraph
    val_dg: DGraph
    test_dg: DGraph
    hm: HookManager
    node_x: jnp.ndarray
    num_nodes: int
    edge_dim: int


def setup_linkpred(args, static_dim: int = 1, shared_hooks: list | None = None) -> LinkPredSetup:
    seed_everything(args.seed)
    data, val_cands, test_cands = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, static_dim)).astype(np.float32)
    train_data, val_data, test_data = data.split()
    train_dg, val_dg, test_dg = DGraph(train_data), DGraph(val_data), DGraph(test_data)

    hm = HookManager(keys=["train", "val", "test"])
    dst = train_dg.edge_dst
    hm.register(
        "train", RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max()))
    )
    if val_cands is not None:
        hm.register("val", TGBNegativeEdgeSamplerHook(candidates=val_cands))
        hm.register("test", TGBNegativeEdgeSamplerHook(candidates=test_cands))
    else:
        hm.register("val", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="val"))
        hm.register("test", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="test"))
    for h in shared_hooks or []:
        hm.register_shared(h)

    return LinkPredSetup(
        data=data,
        train_dg=train_dg,
        val_dg=val_dg,
        test_dg=test_dg,
        hm=hm,
        node_x=jnp.asarray(data.static_node_x),
        num_nodes=data.num_nodes,
        edge_dim=train_dg.edge_x_dim or 0,
    )


def run_epochs(
    setup: LinkPredSetup,
    args,
    train_batch: Callable[[Any], float],
    eval_batch: Callable[[Any], tuple],
    on_epoch_start: Optional[Callable[[], None]] = None,
    on_train_end: Optional[Callable[[], None]] = None,
    on_test_start: Optional[Callable[[], None]] = None,
) -> float:
    """Standard epoch loop: train -> val each epoch, final warm replay + test.

    ``train_batch(batch) -> loss`` and ``eval_batch(batch) -> (rr_sum, count)``
    own all state updates.
    """
    hm = setup.hm

    def eval_split(dg, split):
        loader = DGDataLoader(dg, args.bsize, hook_manager=hm)
        s, c = 0.0, 0.0
        with hm.activate(split):
            for batch in loader:
                ds, dc = eval_batch(batch)
                s += float(ds)
                c += float(dc)
        return s / max(c, 1.0)

    n_edges = setup.train_dg.num_edge_events
    test_mrr = 0.0
    for epoch in range(args.epochs):
        if on_epoch_start:
            on_epoch_start()
        t0 = time.perf_counter()
        loader = DGDataLoader(setup.train_dg, args.bsize, hook_manager=hm)
        total, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                total += float(train_batch(batch))
                nb += 1
        dt = time.perf_counter() - t0
        if on_train_end:
            on_train_end()
        val_mrr = eval_split(setup.val_dg, "val")
        print(
            f"epoch={epoch} loss={total / max(nb, 1):.4f} val_mrr={val_mrr:.4f} "
            f"train_edges/s={n_edges / dt:.0f}"
        )
        if epoch < args.epochs - 1:
            hm.reset_state()

    if on_test_start:
        on_test_start()
    test_mrr = eval_split(setup.test_dg, "test")
    print(f"test_mrr={test_mrr:.4f}")
    return test_mrr
