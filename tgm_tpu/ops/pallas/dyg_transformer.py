"""Fused DyGFormer transformer-stack forward kernel (Pallas TPU) — r5 spike.

The r4 DyGFormer bracket (CHANGELOG.md, 8 attempts at 45.5-46.3k edges/s)
killed every *program restructuring* lever and named exactly one untried
one: a fused transformer megakernel for the (B, 2P, D) = (200, 64, 200)
joint patch sequences, dismissed on a shape argument (200-wide odd minor
dims). This kernel converts that argument into a number (r4 verdict item 7).

Scope: the full ``TransformerEncoder`` stack FORWARD (LN -> MHA -> residual
-> LN -> FFN(gelu) -> residual, ``num_layers`` times) in ONE kernel — every
inter-op activation stays in VMEM instead of round-tripping HBM, which is
the XLA path's cost structure (its profile is wall-to-wall alternate-memory
prefetches of 5-20 MB activations). bf16 matmul operands, f32 accumulation,
f32 LayerNorm statistics and f32 softmax (the flax path computes softmax in
bf16 when ``dtype=bf16`` — the kernel is the *better*-conditioned variant).
Eval semantics (no dropout).

Parity reference for the math: ``TransformerEncoder``
(tgm_tpu/nn/encoder/dygformer.py:161-200), itself pinned against torch
``nn.TransformerEncoder`` usage in the reference
(/root/reference/tgm/nn/encoder/dygformer.py:404-431).

Measured on v5e (tools/dyg_megakernel_spike.py, r5): see
docs/performance.md "DyGFormer megakernel spike".
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-layer parameter names, in the order they are passed to the kernel.
_LAYER_KEYS = (
    "ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo",
    "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2",
)


def convert_flax_layer(p: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Map a ``TransformerEncoder`` flax param subtree (flax-MHA layout) to
    the kernel's flat per-layer dict. Mirrors ``fuse_attention_params``
    (dygformer.py:114-134) for the QKV fusion."""
    mha = p["MultiHeadDotProductAttention_0"]
    D = mha["out"]["kernel"].shape[-1]

    def flat(q):  # (D, H, dh) -> (D, D)
        return q["kernel"].reshape(D, D), q["bias"].reshape(D)

    qk, qb = flat(mha["query"])
    kk, kb = flat(mha["key"])
    vk, vb = flat(mha["value"])
    return {
        "ln1_scale": p["LayerNorm_0"]["scale"],
        "ln1_bias": p["LayerNorm_0"]["bias"],
        "wqkv": jnp.concatenate([qk, kk, vk], axis=1),
        "bqkv": jnp.concatenate([qb, kb, vb]),
        "wo": mha["out"]["kernel"].reshape(D, D),
        "bo": mha["out"]["bias"],
        "ln2_scale": p["LayerNorm_1"]["scale"],
        "ln2_bias": p["LayerNorm_1"]["bias"],
        "w1": p["Dense_0"]["kernel"],
        "b1": p["Dense_0"]["bias"],
        "w2": p["Dense_1"]["kernel"],
        "b2": p["Dense_1"]["bias"],
    }


def _gelu_exact(x32: jnp.ndarray) -> jnp.ndarray:
    """Exact-gelu 0.5*x*(1+erf(x/sqrt2)) with erf via Abramowitz-Stegun
    7.1.26 (max abs err 1.5e-7 — far below the kernel's bf16 operand
    noise). Needed because Mosaic lowers neither ``erf`` nor ``erfc``
    (only ``erf_inv``), so ``jax.nn.gelu(approximate=False)`` fails to
    compile inside a TPU kernel."""
    z = x32 * 0.7071067811865476
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * x32 * (1.0 + erf)


def _ln(x32: jnp.ndarray, scale, bias, eps=1e-5) -> jnp.ndarray:
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, *refs, num_layers: int, num_heads: int, seq_len: int,
            block_b: int):
    o_ref = refs[-1]
    params = refs[:-1]
    D = x_ref.shape[-1]
    S = seq_len
    G = block_b
    dh = D // num_heads
    scale = 1.0 / math.sqrt(dh)

    h = x_ref[...].astype(jnp.float32).reshape(G * S, D)

    for li in range(num_layers):
        lp = params[li * len(_LAYER_KEYS):(li + 1) * len(_LAYER_KEYS)]
        (ln1_s, ln1_b, wqkv, bqkv, wo, bo, ln2_s, ln2_b, w1, b1, w2, b2) = (
            r[...] for r in lp
        )
        # --- attention block -------------------------------------------- #
        hn = _ln(h, ln1_s[0], ln1_b[0])
        qkv = (
            jnp.dot(hn.astype(jnp.bfloat16), wqkv.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + bqkv[0]
        )  # (G*S, 3D) f32
        attn_rows = []
        for g in range(G):
            row0 = g * S
            head_outs = []
            for hd in range(num_heads):
                q = qkv[row0:row0 + S, hd * dh:(hd + 1) * dh]
                k = qkv[row0:row0 + S, D + hd * dh:D + (hd + 1) * dh]
                v = qkv[row0:row0 + S, 2 * D + hd * dh:2 * D + (hd + 1) * dh]
                logits = jnp.dot(
                    q.astype(jnp.bfloat16), k.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                ) * scale  # (S, S) f32
                a = jax.nn.softmax(logits, axis=-1)
                head_outs.append(jnp.dot(
                    a.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ))  # (S, dh)
            attn_rows.append(jnp.concatenate(head_outs, axis=-1))  # (S, D)
        attn = jnp.concatenate(attn_rows, axis=0)  # (G*S, D)
        attn = (
            jnp.dot(attn.astype(jnp.bfloat16), wo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + bo[0]
        )
        h = h + attn
        # --- FFN block --------------------------------------------------- #
        hn = _ln(h, ln2_s[0], ln2_b[0])
        f = (
            jnp.dot(hn.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + b1[0]
        )
        f = _gelu_exact(f)
        f = (
            jnp.dot(f.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + b2[0]
        )
        h = h + f

    o_ref[...] = h.reshape(G, S, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_b", "interpret"),
)
def transformer_stack_fwd(
    x: jnp.ndarray,  # (B, S, D)
    layers: Sequence[Dict[str, jnp.ndarray]],
    *,
    num_heads: int = 2,
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward of the whole transformer stack (eval semantics)."""
    B, S, D = x.shape
    num_layers = len(layers)
    assert B % block_b == 0, (B, block_b)

    flat_params: List[jnp.ndarray] = []
    in_specs = [
        pl.BlockSpec((block_b, S, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    for lp in layers:
        for key in _LAYER_KEYS:
            a = lp[key]
            if a.ndim == 1:  # biases/scales as (1, D) rows for 2-D tiling
                a = a[None, :]
            flat_params.append(a)
            in_specs.append(
                pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM)
            )

    kern = functools.partial(
        _kernel, num_layers=num_layers, num_heads=num_heads, seq_len=S,
        block_b=block_b,
    )
    return pl.pallas_call(
        kern,
        grid=(B // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.float32),
        interpret=interpret,
    )(x, *flat_params)
