"""GC-LSTM snapshot (DTDG) link prediction.

Parity: /root/reference/examples/linkproppred/gclstm.py — discretize the
stream into snapshots, carry (H, C) through a GC-LSTM as snapshots advance,
predict event batches against the latest snapshot embedding, truncate BPTT at
snapshot boundaries, random negatives, MRR-free BCE training loop. Runs the
scanned merged-schedule epoch by default; ``--eager`` restores the host loop.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from examples._snapshot_common import run_snapshot_linkpred
from tgm_tpu.nn import GCLSTM, LinkPredictor
from tgm_tpu.util import seed_everything


def parse_args():
    p = argparse.ArgumentParser(description="GCLSTM snapshot link prediction")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--snapshot-ticks", type=int, default=100, help="graph ticks/snapshot")
    p.add_argument("--K", type=int, default=1)
    p.add_argument("--eager", action="store_true", help="per-batch host loop")
    return p.parse_args()


def main():
    args = parse_args()
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 16)).astype(np.float32)
    num_nodes = data.num_nodes
    node_x = jnp.asarray(data.static_node_x)

    train_data, val_data, test_data = data.split()

    encoder = GCLSTM(in_channels=node_x.shape[1], out_channels=args.embed_dim, K=args.K)
    proj = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    e4 = jnp.zeros(4, jnp.int32)
    enc_params = encoder.init(k1, node_x, e4, e4)
    dec_params = proj.init(k2, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}

    def snap_apply(params, rec, sbatch):
        """Advance the recurrent state over one snapshot graph (BPTT truncated)."""
        H, C = rec
        H2, C2 = encoder.apply(
            params["enc"], node_x, sbatch.edge_src, sbatch.edge_dst,
            None, H, C, sbatch.edge_valid,
        )
        z = jax.nn.relu(H2)
        sg = jax.lax.stop_gradient
        return sg(z), (sg(H2), sg(C2))

    def init_rec():
        z0 = jnp.zeros((num_nodes, args.embed_dim))
        return (z0, z0)

    run_snapshot_linkpred(
        args, train_data, num_nodes, snap_apply, init_rec, proj, opt, params,
        val_data=val_data, test_data=test_data,
        val_cands=val_cands, test_cands=test_cands,
    )


if __name__ == "__main__":
    main()
