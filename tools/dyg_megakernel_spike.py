"""DyGFormer fused-transformer megakernel spike (r4 verdict item 7).

Measures, at exactly the DyGFormer wiki-shape transformer workload
((B, S, D) = (200, 64, 200), 2 layers, 2 heads, bf16 matmuls), the fused
Pallas forward (ops/pallas/dyg_transformer.py — whole stack in VMEM, one
kernel) against the XLA forward (the flax ``TransformerEncoder`` stack the
model runs today). Both timed with the slope method (two scan lengths, the
per-dispatch tunnel overhead cancels — bench.py machine_calibration), both
checked for agreement first.

The number this produces bounds the megakernel's value for training: the
train step runs 2 forwards + 1 backward of this stack per batch, so even a
perfectly-applied kernel (forward AND a custom_vjp backward kernel) speeds
the whole step by at most the forward's ratio on the transformer fraction
of the profile. Verdict goes to docs/performance.md.

Usage: python tools/dyg_megakernel_spike.py [--interpret] [--check-only]
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
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret mode (correctness only)")
    p.add_argument("--check-only", action="store_true")
    p.add_argument("--batch", type=int, default=200)
    p.add_argument("--block-b", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    cache = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tgm_tpu.nn.encoder.dygformer import TransformerEncoder
    from tgm_tpu.ops.pallas.dyg_transformer import (
        convert_flax_layer,
        transformer_stack_fwd,
    )

    B, S, D, H, L = args.batch, 64, 200, 2, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))

    layers = [TransformerEncoder(attention_dim=D, num_heads=H, dropout=0.0,
                                 dtype=jnp.bfloat16) for _ in range(L)]
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    params = [m.init(k, x) for m, k in zip(layers, keys)]

    def xla_fwd(x):
        h = x
        for m, p_ in zip(layers, params):
            h = m.apply(p_, h)
        return h

    kernel_layers = [convert_flax_layer(p_["params"]) for p_ in params]

    def pallas_fwd(x):
        return transformer_stack_fwd(
            x, kernel_layers, num_heads=H, block_b=args.block_b,
            interpret=args.interpret,
        )

    ref = np.asarray(jax.jit(xla_fwd)(x))
    got = np.asarray(pallas_fwd(x))
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
    print(f"max rel err vs flax stack: {err:.2e}")
    # bf16 matmuls + (flax) bf16 softmax vs (kernel) f32 softmax: agree to
    # bf16 rounding, not bitwise.
    assert err < 5e-2, err
    if args.check_only or args.interpret:
        print("check ok")
        return

    def timed_slope(fn, lo=20, hi=100):
        def chain(n):
            def body(h, _):
                out = fn(h)
                # keep the chain honest: feed the output back (same shape)
                return out, None

            return jax.jit(
                lambda: lax.scan(body, x, None, length=n)[0])

        f_lo, f_hi = chain(lo), chain(hi)
        out = {}
        for name, f in (("lo", f_lo), ("hi", f_hi)):
            jax.block_until_ready(f())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best = min(best, time.perf_counter() - t0)
            out[name] = best
        return (out["hi"] - out["lo"]) / (hi - lo)

    t_xla = timed_slope(xla_fwd)
    t_pal = timed_slope(pallas_fwd)
    rec = {
        "metric": "dygformer_transformer_stack_fwd_us",
        "shape": [B, S, D], "layers": L, "heads": H,
        "xla_us": round(t_xla * 1e6, 1),
        "pallas_us": round(t_pal * 1e6, 1),
        "pallas_speedup": round(t_xla / t_pal, 3),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
