"""Microbench: TPNet random-projection pairwise-feature formulations.

The r5 tpnet-eval profile (tools/profile_epoch.py --model tpnet-eval) shows
the RP feature chain dominating the eval epoch: two (160000, 6, 6) f32
inner-product einsums at ~2.0 ms each plus two 0.87 ms relayout copies of
their outputs — ~34% of the 16.9 ms eval batch — because a (6, 6)-minor
batched-tiny-matmul uses ~2% of the VPU/MXU. Candidates:

* current — einsum("bld,bmd->blm") -> log1p -> (B, 36) MLP.
* lanes   — einsum("lbd,mbd->lmb") (pair axis on the 128 lanes, the same
  restructure that took TGN eval +57%) -> (36, B) -> log1p -> TRANSPOSED
  MLP (W^T on the left, so the matmuls are (144, 36) @ (36, B) — B on
  lanes) -> one final (B, 36·4->out) transpose.
* factored-lanes — additionally splits the 6x6 block structure: the
  nbr·nbr and seed·seed diagonal blocks are per-NODE (gathered from a
  per-batch (N, 9) table), only the 3x3 cross block is per-pair.

All produce the same features (fp-level); equivalence asserted here.
Usage: python tools/microbench_rp.py [--rows 160000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=160_000)
    p.add_argument("--nodes", type=int, default=9_228)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=3)  # L+1
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, N, D, L1 = args.rows, args.nodes, args.dim, args.layers
    rng = np.random.default_rng(0)
    proj = jnp.asarray(rng.normal(size=(L1, N, D)).astype(np.float32))
    a_ids = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    b_ids = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    F = 2 * L1  # 6
    W1 = jnp.asarray(rng.normal(size=(F * F, 4 * F * F)).astype(np.float32) * 0.1)
    b1 = jnp.zeros(4 * F * F)
    W2 = jnp.asarray(rng.normal(size=(4 * F * F, F * F)).astype(np.float32) * 0.1)
    b2 = jnp.zeros(F * F)

    def current(a_ids, b_ids):
        a = jnp.moveaxis(proj[:, a_ids], 0, 1)  # (B, 3, 64)
        b = jnp.moveaxis(proj[:, b_ids], 0, 1)
        rp = jnp.concatenate([a, b], axis=1)  # (B, 6, 64)
        feat = jnp.einsum("bld,bmd->blm", rp, rp).reshape(B, F * F)
        feat = jnp.log(jnp.maximum(feat, 0.0) + 1.0)
        h = jnp.maximum(feat @ W1 + b1, 0.0)
        return h @ W2 + b2  # (B, 36)

    def lanes(a_ids, b_ids):
        a = proj[:, a_ids]  # (3, B, 64)
        b = proj[:, b_ids]
        rp = jnp.concatenate([a, b], axis=0)  # (6, B, 64)
        feat = jnp.einsum("lbd,mbd->lmb", rp, rp).reshape(F * F, B)
        feat = jnp.log(jnp.maximum(feat, 0.0) + 1.0)
        h = jnp.maximum(W1.T @ feat + b1[:, None], 0.0)  # (144, B)
        return (W2.T @ h + b2[:, None]).T  # (B, 36)

    def factored(a_ids, b_ids):
        # Per-node diagonal blocks, computed once for all N nodes.
        selfb = jnp.einsum("lnd,mnd->lmn", proj, proj)  # (3, 3, N)
        aa = selfb[:, :, a_ids]  # (3, 3, B)
        bb = selfb[:, :, b_ids]
        a = proj[:, a_ids]  # (3, B, 64)
        b = proj[:, b_ids]
        cross = jnp.einsum("lbd,mbd->lmb", a, b)  # (3, 3, B)
        top = jnp.concatenate([aa, cross], axis=1)  # (3, 6, B)
        bot = jnp.concatenate([jnp.swapaxes(cross, 0, 1), bb], axis=1)
        feat = jnp.concatenate([top, bot], axis=0).reshape(F * F, B)
        feat = jnp.log(jnp.maximum(feat, 0.0) + 1.0)
        h = jnp.maximum(W1.T @ feat + b1[:, None], 0.0)
        return (W2.T @ h + b2[:, None]).T

    fns = {"current": current, "lanes": lanes, "factored": factored}
    ref = np.asarray(jax.jit(current)(a_ids, b_ids))
    errs = {}
    for name, fn in fns.items():
        got = np.asarray(jax.jit(fn)(a_ids, b_ids))
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
        errs[name] = float(err)
        # TPU matmuls run bf16 by default, so the restructured variants agree
        # at bf16 rounding, not 1e-4 (the factored path measured 6.6e-3 on
        # v5e while passing 1e-4 on CPU f32) — record the err in the JSON
        # instead of dying before the timings print.
        assert err < 3e-2, (name, err)

    def timed_slope(fn, lo=10, hi=50):
        def chain(n):
            def body(c, _):
                out = fn((a_ids + c) % N, (b_ids + c) % N)
                return c + 1, out.sum()

            return jax.jit(lambda: lax.scan(body, jnp.int32(0), None,
                                            length=n)[1])

        res = {}
        for tag, n in (("lo", lo), ("hi", hi)):
            f = chain(n)
            jax.block_until_ready(f())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best = min(best, time.perf_counter() - t0)
            res[tag] = best
        return (res["hi"] - res["lo"]) / (hi - lo)

    out = {"rows": B, "max_rel_err": errs}
    for name, fn in fns.items():
        out[f"{name}_us"] = round(timed_slope(fn) * 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
