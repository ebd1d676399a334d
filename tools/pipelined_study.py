"""Pipelined span-handoff eval study (round-4 half of the temporal-scaling
question; STALENESS.md has the training-side stale/resync study).

Training cannot be span-parallelized exactly: the parameter/optimizer chain
makes every batch depend on all previous batches, so any overlap changes the
trajectory — that is the measured `stale` mode. EVALUATION splits cleanly:
state evolution (memory commit + recency buffers) chains but is cheap and
score-independent; candidate scoring is expensive and feeds nothing back.
``pipelined_eval_epoch`` (tgm_tpu/parallel/temporal.py) runs the cheap state
chain as a sequential prologue and overlaps every span's scoring — EXACT
(bit-identical per-batch MRR sums, asserted here and in
tests/test_temporal_parallel.py::test_pipelined_eval_exact).

This script measures, on the ambient device at wiki shapes:

* ``T_full``   — the chain eval epoch (every batch: score + advance),
* ``T_advance``— the state-advance-only epoch (the sequential prologue),

and reports the pipeline model ``T_pipe(n) = T_advance·(n−1)/n + T_full/n``
(span d's scoring starts once the prologue reaches its boundary; the last
span still runs its full scan) with efficiency vs an ideal n-way split.

``--mesh`` additionally demonstrates the schedule executing CONCURRENTLY on
the 8-device virtual CPU mesh: the stacked span axis is sharded across
devices and the measured wall-clock of phase B is compared with the chain
schedule on one device.

Writes STALENESS_r04.json and prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build(num_nodes, num_edges, edge_dim, bsize, Q=20):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import build_stream
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline

    data = build_stream(num_nodes, num_edges, edge_dim)
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, bsize)
    pipe = TGNPipeline(
        num_nodes=num_nodes, edge_dim=edge_dim, memory_dim=100, embed_dim=100,
        time_dim=100, num_nbrs=10, lr=1e-4,
        neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
        edge_x_full=stream.edge_x,
    )
    nb = stream.num_batches
    cands = jax.random.randint(
        jax.random.PRNGKey(1), (nb * bsize, Q),
        int(dg.edge_dst.min()), int(dg.edge_dst.max()) + 1, dtype=jnp.int32)

    def score_fn(c, i):
        rows = lax.dynamic_slice(cands, (i * bsize, 0), (bsize, Q))
        return pipe.eval_step(c, stream.batch_at(i), rows)

    def advance_fn(c, i):
        return pipe.eval_advance_state(c, stream.batch_at(i))

    carry = pipe.flush_all(pipe.init_carry(jax.random.PRNGKey(0)))
    return pipe, stream, score_fn, advance_fn, carry, nb


def timed(fn, *args, reps=3):
    import jax

    out = fn(*args)  # compile + warm
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="also run the 8-device CPU-mesh concurrency demo")
    p.add_argument("--mesh-full", action="store_true",
                   help="measure the FULL span-handoff schedule (phase A "
                   "prologue + sharded phase B, end-to-end wall-clock) on "
                   "n=2/4/8-device virtual CPU meshes vs the one-device "
                   "chain, next to the analytic model (r4 verdict item 6)")
    p.add_argument("--out", default="STALENESS_r05.json",
                   help="artifact filename (repo root)")
    p.add_argument("--bsize", type=int, default=200)
    args = p.parse_args()

    import jax

    if args.mesh_full:
        args.mesh = True
    if args.mesh:
        # The mesh demo needs many devices; force the virtual CPU mesh.
        jax.config.update("jax_platforms", "cpu")
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    cache = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES
    from tgm_tpu.parallel.temporal import pipelined_eval_epoch, split_spans

    if args.smoke or args.mesh:
        shapes = (800, 16_000, 32)
    else:
        shapes = (WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM)
    pipe, stream, score_fn, advance_fn, carry, nb = build(*shapes, args.bsize)

    results = {"shapes": {"nodes": shapes[0], "edges": shapes[1],
                          "edge_dim": shapes[2], "bsize": args.bsize},
               "platform": jax.devices()[0].platform}

    # 1. Exactness: pipelined == chain, bit-identical sums.
    def chain(c):
        return jax.lax.scan(score_fn, c, jnp.arange(nb))

    chain_jit = jax.jit(chain)
    t_full, (c_end, (s_chain, n_chain)) = timed(chain_jit, carry)

    pipe4 = jax.jit(lambda c: pipelined_eval_epoch(advance_fn, score_fn, c, nb, 4))
    t_pipe1dev, (outs, valid) = timed(pipe4, carry)
    v = np.asarray(valid)
    got_s, got_n = np.asarray(outs[0])[v], np.asarray(outs[1])[v]
    exact = (np.array_equal(got_s, np.asarray(s_chain))
             and np.array_equal(got_n, np.asarray(n_chain)))
    results["exact_vs_chain"] = bool(exact)
    # The SCHEDULE is exact (bit-identical on CPU —
    # tests/test_temporal_parallel.py::test_pipelined_eval_exact). On TPU the
    # vmapped span programs can round matmuls differently than the unbatched
    # chain program, and with untrained params near-tie candidate scores can
    # flip a rank — report the epoch-MRR delta instead of asserting bits.
    mrr_chain = float(np.sum(np.asarray(s_chain))) / max(
        float(np.sum(np.asarray(n_chain))), 1.0)
    mrr_pipe = float(got_s.sum()) / max(float(got_n.sum()), 1.0)
    results["mrr_chain"] = round(mrr_chain, 6)
    results["mrr_pipelined"] = round(mrr_pipe, 6)
    results["mrr_abs_delta"] = round(abs(mrr_chain - mrr_pipe), 8)
    assert abs(mrr_chain - mrr_pipe) < 1e-3, (
        f"pipelined eval MRR diverged beyond fp-level: "
        f"{mrr_chain} vs {mrr_pipe}")

    # 2. Components + model.
    def advance_only(c):
        def body(cc, i):
            return advance_fn(cc, i), jnp.float32(0)

        return jax.lax.scan(body, c, jnp.arange(nb))

    t_adv, _ = timed(jax.jit(advance_only), carry)
    results["t_full_s"] = round(t_full, 4)
    results["t_advance_s"] = round(t_adv, 4)
    results["t_pipelined_one_device_s"] = round(t_pipe1dev, 4)
    results["advance_fraction"] = round(t_adv / t_full, 4)
    model = {}
    for n in (2, 4, 8):
        t_pipe = t_adv * (n - 1) / n + t_full / n
        model[f"n{n}"] = {
            "t_model_s": round(t_pipe, 4),
            "speedup_vs_chain": round(t_full / t_pipe, 3),
            "efficiency_vs_ideal": round(t_full / (n * t_pipe), 3),
        }
    results["pipeline_model"] = model

    # 3. Mesh concurrency demo: shard the span axis over 8 CPU devices.
    if args.mesh:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n_dev = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()), ("span",))
        n_spans = n_dev

        # Phase A (host-driven, tiny at these shapes): span start carries.
        spans = split_spans(nb, n_spans)
        starts = [carry]
        c = carry
        adv_jit = jax.jit(
            lambda c, lo, hi: jax.lax.scan(
                lambda cc, i: (advance_fn(cc, i), 0.0), c, jnp.arange(lo, hi))[0],
            static_argnums=(1, 2))
        for s, e in spans[:-1]:
            c = adv_jit(c, s, e)
            starts.append(c)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *starts)
        stacked = jax.device_put(
            stacked, NamedSharding(mesh, P("span")))

        span_len = max(e - s for s, e in spans)
        s0 = jax.device_put(jnp.asarray([s for s, _ in spans]),
                            NamedSharding(mesh, P("span")))
        lens = jax.device_put(jnp.asarray([e - s for s, e in spans]),
                              NamedSharding(mesh, P("span")))

        def run_span(start, length, c0):
            def body(cc, j):
                i = jnp.minimum(start + j, nb - 1)

                def do(cc):
                    return score_fn(cc, i)

                def skip(cc):
                    _, sh = jax.eval_shape(score_fn, cc, i)
                    return cc, jax.tree_util.tree_map(
                        lambda a: jnp.zeros(a.shape, a.dtype), sh)

                return jax.lax.cond(j < length, do, skip, cc)

            return jax.lax.scan(body, c0, jnp.arange(span_len))[1]

        phase_b = jax.jit(jax.vmap(run_span))
        t_b, outs_mesh = timed(phase_b, s0, lens, stacked)
        vm = np.asarray(jnp.arange(span_len)[None, :]
                        < np.asarray([e - s for s, e in spans])[:, None])
        mesh_exact = np.array_equal(np.asarray(outs_mesh[0])[vm],
                                    np.asarray(s_chain))
        results["mesh"] = {
            "devices": n_dev,
            "t_phase_b_sharded_s": round(t_b, 4),
            "t_chain_one_device_s": round(t_full, 4),
            "speedup_phase_b_vs_chain": round(t_full / t_b, 3),
            "exact_vs_chain": bool(mesh_exact),
        }
        assert mesh_exact

    # 4. FULL schedule, measured end-to-end on n-device meshes (r4 verdict
    # item 6: "not just phase B"). For each n: phase A runs the sequential
    # advance prologue on device 0 (n-1 span chains, recording handoff
    # states), the stacked span axis is device_put onto the n-device mesh,
    # and phase B scores all spans concurrently — the wall-clock covers ALL
    # of it, including the resharding transfer. Caveat recorded in the
    # artifact: this host has few physical cores, so n virtual CPU devices
    # time-slice and the one-device chain baseline may itself multithread —
    # measured CPU speedups validate the schedule's OVERLAP (total ~=
    # phase_a + concurrent phase_b), not the ICI-connected ceiling.
    if args.mesh_full:
        import os as _os

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        full = {"host_cores": _os.cpu_count()}

        for n_spans in (2, 4, 8):
            if n_spans > len(jax.devices()):
                continue
            mesh = Mesh(np.array(jax.devices()[:n_spans]), ("span",))
            spans = split_spans(nb, n_spans)
            span_len = max(e - s for s, e in spans)

            adv_jit = jax.jit(
                lambda c, lo, hi: jax.lax.scan(
                    lambda cc, i: (advance_fn(cc, i), 0.0),
                    c, jnp.arange(lo, hi))[0],
                static_argnums=(1, 2))

            def run_span(start, length, c0):
                def body(cc, j):
                    i = jnp.minimum(start + j, nb - 1)

                    def do(cc):
                        return score_fn(cc, i)

                    def skip(cc):
                        _, sh = jax.eval_shape(score_fn, cc, i)
                        return cc, jax.tree_util.tree_map(
                            lambda a: jnp.zeros(a.shape, a.dtype), sh)

                    return jax.lax.cond(j < length, do, skip, cc)

                return jax.lax.scan(body, c0, jnp.arange(span_len))[1]

            phase_b = jax.jit(jax.vmap(run_span))
            sharding = NamedSharding(mesh, P("span"))

            def schedule():
                starts = [carry]
                c = carry
                for s, e in spans[:-1]:
                    c = adv_jit(c, s, e)
                    starts.append(c)
                ta = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *starts)
                ta = jax.device_put(ta, sharding)
                s0 = jax.device_put(
                    jnp.asarray([s for s, _ in spans]), sharding)
                lens = jax.device_put(
                    jnp.asarray([e - s for s, e in spans]), sharding)
                return phase_b(s0, lens, ta)

            t_total, outs_n = timed(schedule)
            vm = (np.arange(span_len)[None, :]
                  < np.asarray([e - s for s, e in spans])[:, None])
            exact_n = np.array_equal(np.asarray(outs_n[0])[vm],
                                     np.asarray(s_chain))
            assert exact_n, f"mesh-full n={n_spans} diverged from chain"
            model_n = model.get(f"n{n_spans}", {})
            full[f"n{n_spans}"] = {
                "devices": n_spans,
                "t_total_measured_s": round(t_total, 4),
                "speedup_measured_vs_chain": round(t_full / t_total, 3),
                "t_model_s": model_n.get("t_model_s"),
                "speedup_model_vs_chain": model_n.get("speedup_vs_chain"),
                "exact_vs_chain": bool(exact_n),
            }
        results["mesh_full_schedule"] = full

    out_path = Path(__file__).resolve().parents[1] / args.out
    merged = {}
    if out_path.exists():
        merged = json.loads(out_path.read_text())
    section = ("cpu_mesh_full" if args.mesh_full else
               "cpu_mesh_demo" if args.mesh else f"{results['platform']}_wiki")
    merged[section] = results
    out_path.write_text(json.dumps(merged, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
