"""Profile the scanned TGN/TGAT epoch on the ambient device and rank ops.

Captures a ``jax.profiler`` trace of one (pre-compiled) epoch and aggregates
the device plane's op durations by fused-op name, printing the top-N —
the measurement step behind every kernel/layout decision (CLAUDE.md: measure
before assuming; round-1 negative results came from skipping this).

The TensorBoard converter is version-broken in this image, so the xplane
protobuf is parsed directly (requires
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python``, set before imports below).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_xplane(trace_dir: str, top: int = 40, min_us: float = 1.0):
    """Aggregate device-plane event durations by op name from an xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    results = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals: dict = defaultdict(float)
        counts: dict = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e6  # -> us
                counts[name] += 1
        if totals:
            results[plane.name] = (totals, counts)
    return results


def print_report(results, top: int = 40):
    for plane, (totals, counts) in results.items():
        total_us = sum(totals.values())
        print(f"\n=== {plane}  (sum of op durations: {total_us/1e3:.2f} ms) ===")
        print(f"{'us total':>12} {'%':>6} {'count':>8}  op")
        for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{us:12.1f} {100*us/total_us:6.2f} {counts[name]:8d}  {name[:120]}")


def run_and_trace(args) -> str:
    import jax
    import numpy as np

    cache_dir = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES, build_stream
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import (
        DeviceEdgeStream,
        TGATPipeline,
        TGNPipeline,
        jit_scan_epoch,
    )

    if args.smoke:
        nn_, ne, ed = 500, 8_000, 32
    else:
        nn_, ne, ed = WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM
    data = build_stream(nn_, ne, ed)
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, args.bsize)
    if args.model == "dygformer":
        # Scanned hook-path DyGFormer exactly as bench.py builds it.
        import time


        import jax.numpy as jnp
        import optax

        from tgm_tpu.hooks import (
            HookManager,
            RandomNegativeEdgeSamplerHook,
            RecencyNeighborHook,
        )
        from tgm_tpu.nn import DyGFormer, LinkPredictor
        from tgm_tpu.train import scanned_hook_epoch
        from tgm_tpu.util.precision import tpu_default_bf16

        embed_dim = 172
        hm = HookManager(keys=["train"])
        hm.register("train", RandomNegativeEdgeSamplerHook(
            low=int(dg.edge_dst.min()), high=int(dg.edge_dst.max())))
        hm.register_shared(RecencyNeighborHook(
            nn_, [20], ["edge_src", "edge_dst", "neg"],
            ["edge_time", "edge_time", "neg_time"], edge_dim=ed,
            edge_x_full=dg._storage._data.edge_x))
        node_x = jnp.asarray(
            np.random.default_rng(0).normal(size=(nn_, 1)).astype(np.float32))
        encoder = DyGFormer(
            node_feat_dim=1, edge_x_dim=ed, time_feat_dim=100,
            channel_embedding_dim=50, output_dim=embed_dim, patch_size=1,
            max_input_sequence_length=32, dropout=0.0,
            compute_bf16=tpu_default_bf16())
        decoder = LinkPredictor(node_dim=embed_dim, hidden_dim=embed_dim)
        opt = optax.adam(1e-4)

        def train_core(carry, batch):
            params, opt_state, rng = carry
            rng, _ = jax.random.split(rng)
            B = batch.edge_src.shape[0]
            nbr, nt, nx = (batch.nbr_nids[0], batch.nbr_edge_time[0],
                           batch.nbr_edge_x[0])

            def loss_fn(p):
                # Two pairwise encoder calls, as the example/bench do (fusing
                # both pairs into one doubled-batch call measured 36.2k vs
                # 37.6k edges/s — the doubled concat of 8 sequence arrays
                # outweighs the per-call saving).
                zs, zd = encoder.apply(
                    p["enc"], node_x, batch.edge_src, batch.edge_dst,
                    batch.edge_time,
                    jnp.concatenate([nbr[:B], nbr[B:2 * B]]),
                    jnp.concatenate([nt[:B], nt[B:2 * B]]),
                    jnp.concatenate([nx[:B], nx[B:2 * B]]),
                )
                zs2, zn = encoder.apply(
                    p["enc"], node_x, batch.edge_src, batch.neg,
                    batch.edge_time,
                    jnp.concatenate([nbr[:B], nbr[2 * B:]]),
                    jnp.concatenate([nt[:B], nt[2 * B:]]),
                    jnp.concatenate([nx[:B], nx[2 * B:]]),
                )
                pos = decoder.apply(p["dec"], zs, zd)
                neg = decoder.apply(p["dec"], zs2, zn)
                m = batch.edge_valid.astype(pos.dtype)
                d = jnp.maximum(m.sum(), 1.0)
                return (jnp.sum(optax.sigmoid_binary_cross_entropy(
                            pos, jnp.ones_like(pos)) * m)
                        + jnp.sum(optax.sigmoid_binary_cross_entropy(
                            neg, jnp.zeros_like(neg)) * m)) / d

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        key = jax.random.PRNGKey(0)
        key, k1, k2 = jax.random.split(key, 3)
        B0 = args.bsize
        enc_params = encoder.init(
            k1, node_x, jnp.zeros(B0, jnp.int32), jnp.zeros(B0, jnp.int32),
            jnp.zeros(B0, jnp.int32), jnp.zeros((2 * B0, 20), jnp.int32),
            jnp.zeros((2 * B0, 20), jnp.int32), jnp.zeros((2 * B0, 20, ed)))
        dec_params = decoder.init(
            k2, jnp.zeros((1, embed_dim)), jnp.zeros((1, embed_dim)))
        params = {"enc": enc_params, "dec": dec_params}
        epoch, hstates = scanned_hook_epoch(stream, hm, "train", dg, train_core)
        carry = (params, opt.init(params), key)
        carry, hstates, losses = epoch(carry, hstates)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        carry, hstates, losses = epoch(carry, hstates)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        print(f"epoch (untraced): {dt*1e3:.1f} ms -> {ne/dt:.0f} edges/s")
        with jax.profiler.trace(args.trace_dir):
            carry, hstates, losses = epoch(carry, hstates)
            jax.block_until_ready(losses)
        return args.trace_dir

    if args.model == "tgn-hooks":
        # The bench's default program: hook DAG + rowwise cores, scanned.
        import time

        import jax.numpy as jnp
        import optax

        from tgm_tpu.hooks import (
            HookManager,
            RandomNegativeEdgeSamplerHook,
            RecencyNeighborHook,
        )
        from tgm_tpu.nn import LinkPredictor
        from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbeddingRowwise, TGNMemory
        from tgm_tpu.train import scanned_hook_epoch
        from tgm_tpu.train.programs import build_tgn_hook_cores

        dims = 100
        hm = HookManager(keys=["train"])
        hm.register("train", RandomNegativeEdgeSamplerHook(
            low=int(dg.edge_dst.min()), high=int(dg.edge_dst.max())))
        hm.register_shared(RecencyNeighborHook(
            nn_, [10], ["edge_src", "edge_dst", "neg"],
            ["edge_time", "edge_time", "neg_time"], edge_dim=ed,
            edge_x_full=dg._storage._data.edge_x))
        memory = TGNMemory(num_nodes=nn_, raw_msg_dim=ed, memory_dim=dims,
                           time_dim=dims)
        encoder = GraphAttentionEmbeddingRowwise(
            in_channels=dims, out_channels=dims, msg_dim=ed, time_dim=dims,
            dropout=0.0)
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
                jnp.zeros((4, 3, ed)), jnp.ones((4, 3), bool)),
            "dec": decoder.init(k3, jnp.zeros((1, dims)), jnp.zeros((1, dims))),
        }
        train_core, _ = build_tgn_hook_cores(
            memory, encoder, decoder, opt, nn_, style="rowwise")
        epoch, hstates = scanned_hook_epoch(stream, hm, "train", dg, train_core)
        carry = (params, opt.init(params), mem_state, key)
        carry, hstates, losses = epoch(carry, hstates)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        carry, hstates, losses = epoch(carry, hstates)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        print(f"epoch (untraced): {dt*1e3:.1f} ms -> {ne/dt:.0f} edges/s")
        with jax.profiler.trace(args.trace_dir):
            carry, hstates, losses = epoch(carry, hstates)
            jax.block_until_ready(losses)
        return args.trace_dir

    zoo = ("tncn", "tpnet", "ctan", "graphmixer")
    if args.model in zoo or args.model in tuple(f"{m}-eval" for m in zoo):
        # Zoo models: run bench_zoo's builder with trace capture enabled
        # (one post-warmup epoch traced via TGM_PROFILE_TRACE_DIR; the
        # "-eval" variants trace the scanned candidate-list EVAL epoch —
        # TGM_PROFILE_PHASE routes the capture inside bench_zoo).
        import bench_zoo

        model, _, phase = args.model.partition("-")
        os.environ["TGM_PROFILE_TRACE_DIR"] = args.trace_dir
        os.environ["TGM_PROFILE_PHASE"] = phase or "train"
        zargs = argparse.Namespace(
            model=model, smoke=args.smoke, bsize=args.bsize, epochs=1,
            snapshot_ticks=86_400, with_eval=phase == "eval",
        )
        fn = {
            "tpnet": bench_zoo.bench_tpnet,
            "ctan": bench_zoo.bench_ctan,
            "tncn": bench_zoo.bench_tncn,
            "graphmixer": bench_zoo.bench_graphmixer,
        }[model]
        eps = fn(zargs, dg, stream, nn_, ne, ed)
        if isinstance(eps, tuple):
            eps, eval_eps = eps
            if isinstance(eval_eps, tuple):  # (edges/s, mrr)
                eval_eps = eval_eps[0]
            print(f"epoch (untraced): {eps:.0f} edges/s; "
                  f"eval {eval_eps:.0f} edges/s")
        else:
            print(f"epoch (untraced): {eps:.0f} edges/s")
        return args.trace_dir

    if args.model in ("tgn-eval", "tgat-eval"):
        # The metric-bearing path: scanned candidate-list eval epoch exactly
        # as bench.py --with-eval builds it (Q=20, TGB-style masked rank).
        import time

        import jax.numpy as jnp
        from jax import lax

        if args.model == "tgat-eval":
            import numpy as _np

            from tgm_tpu.train.tgat_pipeline import TGATPipeline

            node_x = jnp.asarray(
                _np.random.default_rng(0).normal(size=(nn_, 1)).astype(
                    _np.float32)
            )
            pipe = TGATPipeline(
                num_nodes=nn_, edge_dim=ed, node_x=node_x, embed_dim=100,
                time_dim=100, num_nbrs=(10, 10), lr=1e-4,
                neg_low=int(dg.edge_dst.min()),
                neg_high=int(dg.edge_dst.max()),
                edge_x_full=stream.edge_x,
                edge_ends_full=(dg.edge_src, dg.edge_dst),
                attn_score_layout="lanes",
            )
        else:
            pipe = TGNPipeline(
                num_nodes=nn_, edge_dim=ed, memory_dim=100, embed_dim=100,
                time_dim=100, num_nbrs=10, lr=1e-4,
                neg_low=int(dg.edge_dst.min()),
                neg_high=int(dg.edge_dst.max()),
                edge_x_full=stream.edge_x,
            )
        carry = pipe.init_carry(jax.random.PRNGKey(0))
        Q, B, nb = 20, args.bsize, stream.num_batches
        cands = jax.random.randint(
            jax.random.PRNGKey(1), (nb * B, Q),
            int(dg.edge_dst.min()), int(dg.edge_dst.max()) + 1, dtype=jnp.int32)

        # Match the bench's default eval configuration (--eval-proj-table
        # ON): gathers come from the pre-projected embed-wide table, so the
        # profile reflects the program the metric runs.
        proj = (pipe.eval_proj_table(carry.params)
                if hasattr(pipe, "eval_proj_table") else None)

        def eval_epoch(c):
            def body(c, i):
                rows = lax.dynamic_slice(cands, (i * B, 0), (B, Q))
                if proj is not None:
                    return pipe.eval_step(c, stream.batch_at(i), rows,
                                          nbr_proj_table=proj)
                return pipe.eval_step(c, stream.batch_at(i), rows)

            return lax.scan(body, c, jnp.arange(nb))

        eval_jit = jax.jit(eval_epoch, donate_argnums=())
        if hasattr(pipe, "flush_all"):  # TGAT carries no memory to flush
            carry = pipe.flush_all(carry)
        carry, (sm, cc) = eval_jit(carry)
        jax.block_until_ready(sm)
        t0 = time.perf_counter()
        carry, (sm, cc) = eval_jit(carry)
        jax.block_until_ready(sm)
        dt = time.perf_counter() - t0
        print(f"eval epoch (untraced): {dt*1e3:.1f} ms -> {ne/dt:.0f} edges/s")
        with jax.profiler.trace(args.trace_dir):
            carry, (sm, cc) = eval_jit(carry)
            jax.block_until_ready(sm)
        return args.trace_dir

    if args.model == "tgat":
        import jax.numpy as jnp

        node_x = jnp.asarray(
            np.random.default_rng(0).normal(size=(nn_, 1)).astype(np.float32)
        )
        pipe = TGATPipeline(
            num_nodes=nn_, edge_dim=ed, node_x=node_x, num_nbrs=(10, 10),
            time_dim=100, embed_dim=100, lr=1e-4,
            neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
            edge_x_full=stream.edge_x,
            edge_ends_full=(dg.edge_src, dg.edge_dst),
        )
    else:
        pipe = TGNPipeline(
            num_nodes=nn_, edge_dim=ed, memory_dim=100, embed_dim=100,
            time_dim=100, num_nbrs=10, lr=1e-4,
            neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
            edge_x_full=stream.edge_x,
        )
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    use_tables = getattr(pipe, "aug_x", None) is not None
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches,
                           tables=pipe.tables if use_tables else None,
                           bind=pipe.bind_tables if use_tables else None)

    carry, losses = epoch(carry)  # compile + warm
    jax.block_until_ready(losses)

    import time

    t0 = time.perf_counter()
    carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    print(f"epoch (untraced): {dt*1e3:.1f} ms -> {ne/dt:.0f} edges/s")

    with jax.profiler.trace(args.trace_dir):
        carry, losses = epoch(carry)
        jax.block_until_ready(losses)
    return args.trace_dir


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--model", type=str, default="tgn", choices=["tgn", "tgn-hooks", "tgn-eval", "tgat", "tgat-eval", "dygformer",
                            "tncn", "tpnet", "ctan", "graphmixer",
                            "tncn-eval", "tpnet-eval", "ctan-eval",
                            "graphmixer-eval"])
    p.add_argument("--trace-dir", type=str, default="/tmp/tgm_trace")
    p.add_argument("--parse-only", action="store_true",
                   help="only parse an existing trace dir")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    if not args.parse_only:
        run_and_trace(args)
    print_report(parse_xplane(args.trace_dir), top=args.top)


if __name__ == "__main__":
    main()
