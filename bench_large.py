"""Benchmark: chunk-streamed TGN training on datasets larger than HBM.

The reference's *large* perf tier trains on tgbl-flight (~67M edges) and
tgbn-reddit (/root/reference/test/performance/conftest.py:10-17) with
host-side per-batch slicing. tgm_tpu's resident scanned epoch
(``DeviceEdgeStream``) requires the split in HBM; this bench exercises the
chunk-streamed epoch (``tgm_tpu/train/chunked.py``) that lifts that limit:

* default (large tier): a tgbl-flight-shaped synthetic stream whose edge
  feature table alone exceeds v5e HBM (25M edges x 172 f32 = 17.2 GB vs
  16 GB), trained end-to-end with the hook API (random negatives + recency
  neighbors in the feature-carrying layout + TGN). Peak device residency is
  tracked from the client's live-array registry at every chunk boundary.
* ``--wiki-ratio``: tgbl-wiki shapes, chunked vs resident scanned epoch —
  the streaming-overhead ratio at shapes where both paths work.

Prints exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np

BASELINE_CUDA_ESTIMATE_EDGES_PER_SEC = 15_000.0
V5E_HBM_GB = 16.0

# tgbl-flight shape (BASELINE.md large tier); 25M edges keeps host-gen and
# epoch time tractable while the f32 feature table still exceeds v5e HBM.
FLIGHT_NODES = 18_143
LARGE_EDGES = 25_000_000
LARGE_EDGE_DIM = 172


def build_model(num_nodes: int, edge_dim: int):
    import jax
    import jax.numpy as jnp
    import optax

    from tgm_tpu.nn import LinkPredictor
    from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbeddingRowwise, TGNMemory
    from tgm_tpu.train.programs import build_tgn_hook_cores

    dims = 100
    memory = TGNMemory(num_nodes=num_nodes, raw_msg_dim=edge_dim,
                       memory_dim=dims, time_dim=dims)
    encoder = GraphAttentionEmbeddingRowwise(
        in_channels=dims, out_channels=dims, msg_dim=edge_dim, time_dim=dims,
        dropout=0.0,
    )
    decoder = LinkPredictor(node_dim=dims, hidden_dim=dims)
    opt = optax.adam(1e-4)
    key = jax.random.PRNGKey(0)
    key, k1, k2, k3 = jax.random.split(key, 4)
    mem_state = memory.init_state()
    params = {
        "mem": memory.init(k1, mem_state, jnp.zeros(8, jnp.int32)),
        "enc": encoder.init(
            k2, jnp.zeros((4, dims)), jnp.zeros((4, 3, dims)),
            jnp.zeros(4, jnp.int32), jnp.zeros((4, 3), jnp.int32),
            jnp.zeros((4, 3, edge_dim)), jnp.ones((4, 3), bool),
        ),
        "dec": decoder.init(k3, jnp.zeros((1, dims)), jnp.zeros((1, dims))),
    }
    opt_state = opt.init(params)
    core, _ = build_tgn_hook_cores(memory, encoder, decoder, opt, num_nodes,
                                   style="rowwise")
    return core, (params, opt_state, mem_state, key)


def build_hooks(num_nodes: int, edge_dim: int, num_nbrs: int = 10):
    from tgm_tpu.hooks import (
        HookManager,
        RandomNegativeEdgeSamplerHook,
        RecencyNeighborHook,
    )

    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=num_nodes))
    # Feature-carrying recency layout: the only layout valid when the edge
    # feature table exceeds HBM (the eid layout gathers from a resident
    # full-table copy at query time).
    hm.register_shared(
        RecencyNeighborHook(
            num_nodes, [num_nbrs], ["edge_src", "edge_dst", "neg"],
            ["edge_time", "edge_time", "neg_time"], edge_dim=edge_dim,
        )
    )
    return hm


def time_epochs(epoch, carry, hstates, n_timed: int):
    import jax

    carry, hstates, losses = epoch(carry, hstates)  # compile + warm
    jax.block_until_ready(losses)
    times = []
    for _ in range(max(n_timed, 1)):
        t0 = time.perf_counter()
        carry, hstates, losses = epoch(carry, hstates)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    # Finiteness check LAST: the first device->host read flips the remote
    # tunnel into its 20x-slower H2D mode for the rest of the process
    # (tgm_tpu/train/chunked.py docstring), so no fetch may happen before
    # the timed epochs' chunk uploads.
    first = float(np.asarray(losses).ravel()[0])
    assert np.isfinite(first), f"non-finite loss: {first}"
    return times


def run_large(args) -> dict:
    import jax

    from tgm_tpu.train import ChunkedEdgeStream
    from tgm_tpu.train.chunked import chunked_hook_epoch

    if args.smoke:
        E, N, D, C = 40_000, 500, 32, 20
    else:
        E, N, D, C = args.edges, FLIGHT_NODES, args.edge_dim, args.chunk_batches
    B = args.bsize
    num_batches = math.ceil(E / B)
    while num_batches % C:  # avoid a second (remainder-chunk) compile
        C -= 1

    rng = np.random.default_rng(0)
    t_gen0 = time.perf_counter()
    src = rng.integers(0, N, E, dtype=np.int32)
    dst = rng.integers(0, N, E, dtype=np.int32)
    t = np.sort(rng.integers(0, 2**30, E, dtype=np.int32))
    edge_x = rng.random((E, D), dtype=np.float32)
    gen_s = time.perf_counter() - t_gen0

    feat_dtype = _feat_dtype(args)
    stream = ChunkedEdgeStream.from_arrays(src, dst, t, edge_x, B, C,
                                           feat_dtype=feat_dtype)
    feature_gb = edge_x.nbytes / 1e9
    stream_gb = (edge_x.nbytes + src.nbytes + dst.nbytes + t.nbytes) / 1e9

    # Peak device residency, sampled from the client live-array registry at
    # every chunk upload (the residency high-water mark: new chunk landed,
    # previous chunk possibly still computing).
    peak = {"bytes": 0}
    inner_put = stream.put_chunk

    def tracked_put(k):
        chunk = inner_put(k)
        live = sum(a.nbytes for a in jax.live_arrays())
        peak["bytes"] = max(peak["bytes"], live)
        return chunk

    stream.put_chunk = tracked_put

    hm = build_hooks(N, D)
    core, carry = build_model(N, D)
    epoch, hstates = chunked_hook_epoch(stream, hm, "train", None, core)
    times = time_epochs(epoch, carry, hstates, args.epochs)

    edges_per_sec = E / min(times)
    out = {
        "metric": "tgn_large_stream_train_edges_per_sec_flight_shape",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "execution": "chunked_hook_api",
        "num_edges": E,
        "edge_dim": D,
        "chunk_batches": stream.chunk_batches,
        "num_chunks": stream.num_chunks,
        "edge_feature_gb": round(feature_gb, 2),
        "stream_gb": round(stream_gb, 2),
        "exceeds_hbm": stream_gb > V5E_HBM_GB,
        "peak_device_live_gb": round(peak["bytes"] / 1e9, 3),
        "chunk_gb": round(stream.chunk_nbytes / 1e9, 4),
        "host_gen_s": round(gen_s, 1),
        "stream_feat_dtype": str(np.dtype(stream._edge_x.dtype)),
        "vs_baseline": round(edges_per_sec / BASELINE_CUDA_ESTIMATE_EDGES_PER_SEC, 3),
        "baseline_is": "tgm_cuda_estimate_15k",
    }
    if not args.smoke:
        assert out["exceeds_hbm"], "large tier must exceed HBM to mean anything"
        assert out["peak_device_live_gb"] < V5E_HBM_GB
    return out


def run_wiki_ratio(args) -> dict:
    from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES, build_stream

    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import ChunkedEdgeStream, DeviceEdgeStream
    from tgm_tpu.train.chunked import chunked_hook_epoch
    from tgm_tpu.train.hook_pipeline import scanned_hook_epoch

    if args.smoke:
        N, E, D = 500, 8_000, 32
    else:
        N, E, D = WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM
    B = args.bsize
    data = build_stream(N, E, D)
    dg = DGraph(data)

    # Chunked epoch FIRST: its uploads need the tunnel's fast H2D mode, and
    # the resident path's end-of-timing loss fetch would flip the mode
    # (tgm_tpu/train/chunked.py docstring). The resident epoch uploads only
    # at stream construction, so running second costs it nothing timed.
    num_batches = math.ceil(E / B)
    C = args.chunk_batches
    while num_batches % C:
        C -= 1
    core, carry = build_model(N, D)
    hm = build_hooks(N, D)
    ch = ChunkedEdgeStream(dg, B, C, feat_dtype=_feat_dtype(args))
    epoch_c, hs = chunked_hook_epoch(ch, hm, "train", dg, core)
    t_ch = time_epochs(epoch_c, carry, hs, args.epochs)

    # Resident scanned epoch, feature-carrying layout (apples-to-apples:
    # the chunked path cannot use the eid layout).
    core, carry = build_model(N, D)
    hm = build_hooks(N, D)
    res = DeviceEdgeStream(dg, B)
    epoch_r, hs = scanned_hook_epoch(res, hm, "train", dg, core)
    t_res = time_epochs(epoch_r, carry, hs, args.epochs)

    res_eps = E / min(t_res)
    ch_eps = E / min(t_ch)
    return {
        "metric": "tgn_chunked_vs_resident_ratio_tgbl_wiki_shape",
        "value": round(res_eps / ch_eps, 3),
        "unit": "x (resident/chunked epoch-time ratio; 1.0 = free streaming)",
        "resident_edges_per_sec": round(res_eps, 1),
        "chunked_edges_per_sec": round(ch_eps, 1),
        "chunk_batches": ch.chunk_batches,
        "num_chunks": ch.num_chunks,
        "recency_layout": "feats",
        "stream_feat_dtype": str(np.dtype(ch._edge_x.dtype)),
        "vs_baseline": round(ch_eps / BASELINE_CUDA_ESTIMATE_EDGES_PER_SEC, 3),
        "baseline_is": "tgm_cuda_estimate_15k",
    }


def _feat_dtype(args):
    """bf16 in-transit edge features (default): halves chunk upload bytes —
    decisive once a device->host fetch has flipped the remote tunnel to its
    ~75 MB/s H2D mode (tgm_tpu/train/chunked.py docstring). ``batch_at``
    casts back to f32 on device; only transit precision changes."""
    if args.feat_f32:
        return None
    import ml_dtypes

    return ml_dtypes.bfloat16


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny shapes, fast check")
    p.add_argument("--feat-f32", action="store_true",
                   help="stream edge features as f32 instead of bf16")
    p.add_argument("--wiki-ratio", action="store_true",
                   help="chunked vs resident at tgbl-wiki shapes")
    p.add_argument("--edges", type=int, default=LARGE_EDGES)
    p.add_argument("--edge-dim", type=int, default=LARGE_EDGE_DIM)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--chunk-batches", type=int, default=500,
                   help="batches per super-chunk (rounded down to divide the "
                   "epoch so one chunk program serves every chunk)")
    p.add_argument("--epochs", type=int, default=2,
                   help="timed epochs after warmup (min reported)")
    args = p.parse_args()

    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = run_wiki_ratio(args) if args.wiki_ratio else run_large(args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
