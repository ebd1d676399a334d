"""Density-of-states (spectral density) analytics example.

Parity: /root/reference/examples/analytics/dos.py:37-60 — defines a *custom*
hook computing the spectral density (eigenvalue histogram of the normalized
snapshot adjacency) per batch, demonstrating the user-defined-hook API.

TPU note: the KPM/eigen estimation here uses dense eigvals on the (small)
batch subgraph via host numpy — analytics hooks are diagnostics, not hot
path.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.hooks import HookManager, StatelessHook, hook
from tgm_tpu.util import seed_everything


@hook
class SpectralDensityHook(StatelessHook):
    """Eigenvalue histogram of the batch subgraph's normalized adjacency."""

    _cls_requires = {"edge_src", "edge_dst"}
    _cls_produces = {"spectral_density", "spectral_bins"}

    def __init__(self, num_nodes: int, bins: int = 11, id=None) -> None:
        super().__init__(id=id)
        self.num_nodes = num_nodes
        self.bins = bins

    def __call__(self, dg, batch):
        src = np.asarray(batch.edge_src)
        dst = np.asarray(batch.edge_dst)
        valid = np.asarray(batch.edge_valid) if batch.edge_valid is not None else np.ones(len(src), bool)
        nodes = np.unique(np.concatenate([src[valid], dst[valid]]))
        if len(nodes) == 0:
            return batch
        remap = {n: i for i, n in enumerate(nodes.tolist())}
        A = np.zeros((len(nodes), len(nodes)))
        for s, d in zip(src[valid], dst[valid]):
            A[remap[s], remap[d]] = A[remap[d], remap[s]] = 1.0
        deg = np.maximum(A.sum(1), 1.0)
        D = np.diag(deg**-0.5)
        evals = np.linalg.eigvalsh(D @ A @ D)
        hist, edges = np.histogram(evals, bins=self.bins, range=(-1, 1), density=True)
        self.add_batch_attribute(batch, "spectral_density", hist)
        self.add_batch_attribute(batch, "spectral_bins", edges)
        return batch


def main():
    p = argparse.ArgumentParser(description="Spectral density (DOS) example")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset)
    dg = DGraph(data)
    hm = HookManager(keys=["analytics"])
    hm.register("analytics", SpectralDensityHook(num_nodes=data.num_nodes))

    with hm.activate("analytics"):
        for i, batch in enumerate(DGDataLoader(dg, args.bsize, hook_manager=hm)):
            d = np.round(batch.spectral_density, 2)
            print(f"batch={i} dos={d.tolist()}")
            if i >= 4:
                break


if __name__ == "__main__":
    main()
