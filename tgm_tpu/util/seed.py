"""Deterministic seeding helpers.

Parity: reference ``seed_everything`` (/root/reference/tgm/util/seed.py:11-25).
JAX is functional-PRNG based, so in addition to seeding python/numpy global
state we maintain a root ``jax.random`` key that seeded components fork from.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

_root_key = None
_seed: Optional[int] = None


def seed_everything(seed: int) -> None:
    """Seed python, numpy, and the framework's root jax PRNG key."""
    global _root_key, _seed
    random.seed(seed)
    np.random.seed(seed)
    _seed = seed
    import jax

    _root_key = jax.random.PRNGKey(seed)


def get_seed() -> Optional[int]:
    return _seed


def fork_key(n: int = 1):
    """Split ``n`` fresh keys off the root key (advancing it)."""
    global _root_key
    import jax

    if _root_key is None:
        seed_everything(0)
    keys = jax.random.split(_root_key, n + 1)
    _root_key = keys[0]
    return keys[1] if n == 1 else keys[1:]
