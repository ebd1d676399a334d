"""GC-LSTM snapshot node property prediction.

Parity: /root/reference/examples/nodeproppred/gclstm.py — GC-LSTM recurrence
over snapshots, NodePredictor head, NDCG@10. Reuses the GCN nodepred harness.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.nodeproppred.gcn import main
from tgm_tpu.nn import GCLSTM


def make_encoder(args, node_dim):
    return GCLSTM(in_channels=node_dim, out_channels=args.embed_dim, K=1)


def snapshot_apply(encoder, params, node_x, HC, sbatch):
    H, C = HC if HC is not None else (None, None)
    H2, C2 = encoder.apply(params, node_x, sbatch.edge_src, sbatch.edge_dst, None,
                           H, C, sbatch.edge_valid)
    H2 = jax.lax.stop_gradient(H2)
    C2 = jax.lax.stop_gradient(C2)
    return jax.nn.relu(H2), (H2, C2)


if __name__ == "__main__":
    main(
        make_encoder=make_encoder,
        snapshot_apply=snapshot_apply,
        init_H=lambda n, d: (jnp.zeros((n, d)), jnp.zeros((n, d))),
    )
