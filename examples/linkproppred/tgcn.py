"""TGCN snapshot (DTDG) link prediction.

Parity: /root/reference/examples/linkproppred/tgcn.py — TGCN gated recurrent
cell carried across snapshots, event batches predicted against the latest
hidden state; BPTT truncated at snapshot boundaries.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from examples._snapshot_common import run_snapshot_linkpred
from tgm_tpu.nn import TGCN, LinkPredictor
from tgm_tpu.util import seed_everything


def main():
    import argparse

    p = argparse.ArgumentParser(description="TGCN snapshot link prediction")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--snapshot-ticks", type=int, default=100)
    p.add_argument("--eager", action="store_true", help="per-batch host loop")
    args = p.parse_args()
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 16)).astype(np.float32)
    num_nodes = data.num_nodes
    node_x = jnp.asarray(data.static_node_x)
    train_data, val_data, test_data = data.split()

    encoder = TGCN(in_channels=node_x.shape[1], out_channels=args.embed_dim)
    decoder = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    e4 = jnp.zeros(4, jnp.int32)
    params = {
        "enc": encoder.init(k1, node_x, e4, e4),
        "dec": decoder.init(k2, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim))),
    }

    def snap_apply(params, H, sbatch):
        H2 = encoder.apply(
            params["enc"], node_x, sbatch.edge_src, sbatch.edge_dst, None, H,
            sbatch.edge_valid,
        )
        H2 = jax.lax.stop_gradient(H2)
        return H2, H2

    run_snapshot_linkpred(
        args, train_data, num_nodes, snap_apply,
        lambda: jnp.zeros((num_nodes, args.embed_dim)),
        decoder, opt, params,
        val_data=val_data, test_data=test_data,
        val_cands=val_cands, test_cands=test_cands,
    )


if __name__ == "__main__":
    main()
