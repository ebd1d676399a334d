"""Repro: full-epoch scanned TGN at batch >= 600 crashes the TPU worker.

Observed on v5e via the axon tunnel (round 2): `python bench.py --bsize 800`
(and 600) dies mid-epoch with "UNAVAILABLE: TPU device error" / "TPU worker
process crashed"; batch 200/400 run entire epochs repeatedly. Bisects to
scan length ~100-150 at B=800 (n=100 ok, n=150 crashes); a single jitted
step and a 5-step scan at B=800 are fine, and the Pallas select kernel is
NOT the cause (the jnp-fallback select crashes identically). Usage:

    python tools/repro_large_batch_fault.py 197   # crashes
    python tools/repro_large_batch_fault.py 100   # ok

Suspected libtpu/runtime issue at these program shapes; B>=600 is not a
shipped configuration (BSIZE_STUDY.md keeps the reference's batch 200).
"""

import sys
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1])
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from bench import build_stream
from tgm_tpu.core.graph import DGraph
from tgm_tpu.train import DeviceEdgeStream, TGNPipeline
from jax import lax

num_nodes, num_edges, edge_dim = 9227, 157474, 172
data = build_stream(num_nodes, num_edges, edge_dim)
dg = DGraph(data)
stream = DeviceEdgeStream(dg, 800)
pipe = TGNPipeline(num_nodes=num_nodes, edge_dim=edge_dim, memory_dim=100,
                   embed_dim=100, time_dim=100, num_nbrs=10, lr=1e-4,
                   neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
                   edge_x_full=stream.edge_x)
carry = pipe.init_carry(jax.random.PRNGKey(0))
def epoch(c):
    def body(c, i):
        return pipe.train_step(c, stream.batch_at(i))
    return lax.scan(body, c, jnp.arange(n))
c, losses = jax.jit(epoch)(carry)
l = np.asarray(jax.block_until_ready(losses))
print(f"n={n}: ok finite={np.isfinite(l).all()}")
