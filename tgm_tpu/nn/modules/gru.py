"""GRU cell with the torch parameter layout (separate input/hidden biases).

Functionally identical to a standard GRU, but keeps torch's four parameter
leaves — ``wi (in, 3H)``, ``bi (3H,)``, ``wh (H, 3H)``, ``bh (3H,)`` with gate
order (reset, update, new) — instead of flax ``GRUCell``'s per-gate Dense
modules with merged r/z biases.

Why this matters: merging ``b_ih + b_hh`` into one leaf changes *training*
trajectories under Adam even though the forward is identical — Adam normalizes
per leaf, so one merged bias receives half the effective step of two separate
biases. The reference TGN memory updater is ``torch.nn.GRUCell``
(/root/reference/tgm/nn/encoder/tgn.py:124), so exact optimizer-trajectory
parity requires the torch leaf structure.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _torch_gru_init(key, shape, dtype=jnp.float32):
    """torch GRUCell default: U(-1/sqrt(H), 1/sqrt(H)) for all leaves."""
    import jax

    h = shape[-1] // 3
    bound = 1.0 / (h**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchGRUCell(nn.Module):
    """GRU cell matching ``torch.nn.GRUCell`` parameters and math exactly.

    ``__call__(h, x) -> (h_new, h_new)`` mirrors flax's carry convention so it
    drops into existing ``new_h, _ = self.gru(h, x)`` call sites.
    """

    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray):
        H = self.features
        wi = self.param("wi", _torch_gru_init, (x.shape[-1], 3 * H))
        bi = self.param("bi", _torch_gru_init, (3 * H,))
        wh = self.param("wh", _torch_gru_init, (H, 3 * H))
        bh = self.param("bh", _torch_gru_init, (3 * H,))

        gi = x @ wi + bi
        gh = h @ wh + bh
        i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
        h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]

        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = nn.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new


__all__ = ["TorchGRUCell"]
