import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu.exceptions import CheckpointError
from tgm_tpu.train.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)


def test_save_restore_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "mem": jnp.ones((4, 2)),
        "count": jnp.asarray(7, jnp.int32),
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state)
    out = restore_checkpoint(p, like=jax.tree_util.tree_map(jnp.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.asarray(state["params"]["w"]))
    assert int(out["count"]) == 7


def test_restore_missing_raises(tmp_path):
    with pytest.raises(CheckpointError):
        restore_checkpoint(str(tmp_path / "nope"))


def test_manager_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    for step in range(4):
        mgr.save(step, {"x": jnp.asarray(float(step))})
    assert mgr.latest_step() == 3
    out = mgr.restore(like={"x": jnp.asarray(0.0)})
    assert float(out["x"]) == 3.0
    mgr.close()


def test_tgn_carry_checkpoint(tmp_path):
    """Full training carry (params+opt+memory+recency+rng) round-trips."""
    from tgm_tpu.train import TGNPipeline

    pipe = TGNPipeline(num_nodes=16, edge_dim=4, memory_dim=8, embed_dim=8,
                       time_dim=4, num_nbrs=3, neg_high=16)
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    p = str(tmp_path / "carry")
    save_checkpoint(p, carry._asdict())
    zero = jax.tree_util.tree_map(jnp.zeros_like, carry._asdict())
    out = restore_checkpoint(p, like=zero)
    for a, b in zip(jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(carry._asdict())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
