"""Backend-dependent precision policy helpers.

The bf16 compute paths (TemporalAttention.kv_bf16, DyGFormer.compute_bf16)
default ON for TPU backends: the MXU already rounds f32 matmul operands to
bf16 with f32 accumulation, so the explicit-bf16 paths change numerics only
in already-rounded places while removing per-step convert sweeps and
relayout copies (measured +19% TGAT, +20% DyGFormer on v5e). CPU/GPU stay
f32 (true-f32 matmuls there; parity tests compare against f32 torch).
"""

from __future__ import annotations

from typing import Optional, Union


def tpu_default_bf16() -> bool:
    """True when the default JAX backend benefits from explicit-bf16 paths."""
    try:
        import jax

        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def resolve_bf16(choice: Union[str, bool, None]) -> bool:
    """Resolve a tri-state bf16 flag: 'auto'/None -> backend default,
    'on'/'off' (or bools) -> forced."""
    if choice in (None, "auto"):
        return tpu_default_bf16()
    if isinstance(choice, str):
        return {"on": True, "off": False}[choice]
    return bool(choice)
