"""TGN memory semantics parity vs the reference implementation (torch CPU).

Streams random batches through the reference ``TGNMemory`` (IdentityMessage +
LastAggregator) and our functional memory with identical weights, comparing
staged memory, last_update, stored memory after commits, and the train→eval
flush — the subtlest semantics in the framework (SURVEY.md §7.3 item 2).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    from tests.test_reference_parity import _stub_pyg

    _stub_pyg()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import tgm  # noqa: F401

    return sys.modules["tgm"]


def t2n(x):
    return x.detach().cpu().numpy()


def _copy_weights(ref_mem, ours, state, nids0):
    """torch TGNMemory -> flax params (Time2Vec + GRUCell gate mapping)."""
    import jax
    import jax.numpy as jnp

    params = ours.init(jax.random.PRNGKey(0), state, nids0)
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy as dicts
    p["params"]["time_enc"] = {
        "w": t2n(ref_mem.time_enc.w.weight).T,
        "b": t2n(ref_mem.time_enc.w.bias),
    }
    p["params"]["gru"] = {
        "wi": t2n(ref_mem.memory_updater.weight_ih).T,
        "bi": t2n(ref_mem.memory_updater.bias_ih),
        "wh": t2n(ref_mem.memory_updater.weight_hh).T,
        "bh": t2n(ref_mem.memory_updater.bias_hh),
    }
    return p


def test_tgn_memory_stream_parity(ref):
    import jax.numpy as jnp

    from tgm.nn.encoder.tgn import IdentityMessage, LastAggregator, TGNMemory as RefMem

    from tgm_tpu.nn.encoder.tgn import TGNMemory, tgn_store_messages

    torch.manual_seed(0)
    N, R, H, T = 12, 3, 6, 4
    ref_mem = RefMem(
        N, R, H, T,
        message_module=IdentityMessage(R, H, T),
        aggregator_module=LastAggregator(),
    ).train()

    ours = TGNMemory(num_nodes=N, raw_msg_dim=R, memory_dim=H, time_dim=T)
    state = ours.init_state()
    params = _copy_weights(ref_mem, ours, state, jnp.zeros(4, jnp.int32))

    rng = np.random.default_rng(0)
    t_cursor = 1
    for step in range(6):
        B = 5
        src = rng.integers(0, N, B).astype(np.int64)
        dst = rng.integers(0, N, B).astype(np.int64)
        t = np.sort(rng.integers(t_cursor, t_cursor + 20, B)).astype(np.int64)
        t_cursor = int(t.max()) + 1
        raw = rng.normal(size=(B, R)).astype(np.float32)

        # Query a superset of nodes (batch nodes + random extras).
        n_id = np.unique(np.concatenate([src, dst, rng.integers(0, N, 3)]))

        z_ref, lu_ref = ref_mem(torch.from_numpy(n_id))
        z_ours, lu_ours = ours.apply(
            params, state, jnp.asarray(n_id, jnp.int32), method=TGNMemory.stage
        )
        np.testing.assert_allclose(np.asarray(z_ours), t2n(z_ref), atol=3e-5,
                                   err_msg=f"staged memory step {step}")
        np.testing.assert_array_equal(np.asarray(lu_ours), t2n(lu_ref))

        # Commit: reference train-mode update_state (flush batch nodes, then
        # overwrite their message stores); ours mirrors.
        ref_mem.update_state(
            torch.from_numpy(src), torch.from_numpy(dst),
            torch.from_numpy(t), torch.from_numpy(raw),
        )
        nodes = jnp.asarray(np.concatenate([src, dst]), jnp.int32)
        state = ours.apply(params, state, nodes, method=TGNMemory.flush)
        state = tgn_store_messages(
            state, jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
            jnp.asarray(t, jnp.int32), jnp.asarray(raw),
            jnp.ones(B, bool),
        )
        np.testing.assert_allclose(
            np.asarray(state.mem[:N]), t2n(ref_mem.memory), atol=3e-5,
            err_msg=f"stored memory step {step}",
        )
        np.testing.assert_array_equal(
            np.asarray(state.last_update[:N]), t2n(ref_mem.last_update)
        )

    # Train -> eval flush.
    ref_mem.eval()  # triggers full flush + store reset
    state = ours.apply(params, state, method=TGNMemory.flush_all)
    np.testing.assert_allclose(np.asarray(state.mem[:N]), t2n(ref_mem.memory), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(state.last_update[:N]), t2n(ref_mem.last_update))
    assert not bool(np.asarray(state.s_valid).any())

    # Eval-mode ordering: store then apply immediately.
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([2, 3], dtype=np.int64)
    t = np.array([t_cursor, t_cursor + 1], dtype=np.int64)
    raw = rng.normal(size=(2, 3)).astype(np.float32)
    ref_mem.update_state(
        torch.from_numpy(src), torch.from_numpy(dst),
        torch.from_numpy(t), torch.from_numpy(raw),
    )
    state = tgn_store_messages(
        state, jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(t, jnp.int32), jnp.asarray(raw), jnp.ones(2, bool),
    )
    state = ours.apply(
        params, state, jnp.asarray(np.concatenate([src, dst]), jnp.int32),
        method=TGNMemory.flush,
    )
    np.testing.assert_allclose(np.asarray(state.mem[:N]), t2n(ref_mem.memory), atol=3e-5)


def test_tgn_memory_mean_aggregator_parity(ref):
    import jax.numpy as jnp

    from tgm.nn.encoder.tgn import IdentityMessage, MeanAggregator, TGNMemory as RefMem

    from tgm_tpu.nn.encoder.tgn import TGNMemory

    torch.manual_seed(1)
    N, R, H, T = 10, 2, 4, 3
    ref_mem = RefMem(
        N, R, H, T,
        message_module=IdentityMessage(R, H, T),
        aggregator_module=MeanAggregator(),
    ).train()

    ours = TGNMemory(num_nodes=N, raw_msg_dim=R, memory_dim=H, time_dim=T,
                     aggregator="mean", mean_slots=8)
    state = ours.init_state()
    params = _copy_weights(ref_mem, ours, state, jnp.zeros(4, jnp.int32))

    rng = np.random.default_rng(1)
    t_cursor = 1
    for step in range(5):
        B = 6
        src = rng.integers(0, N, B).astype(np.int64)
        dst = rng.integers(0, N, B).astype(np.int64)
        t = np.sort(rng.integers(t_cursor, t_cursor + 15, B)).astype(np.int64)
        t_cursor = int(t.max()) + 1
        raw = rng.normal(size=(B, R)).astype(np.float32)
        n_id = np.unique(np.concatenate([src, dst]))

        z_ref, lu_ref = ref_mem(torch.from_numpy(n_id))
        z_ours, lu_ours = ours.apply(
            params, state, jnp.asarray(n_id, jnp.int32), method=TGNMemory.stage
        )
        np.testing.assert_allclose(np.asarray(z_ours), t2n(z_ref), atol=3e-5,
                                   err_msg=f"mean staged step {step}")
        np.testing.assert_array_equal(np.asarray(lu_ours), t2n(lu_ref))

        ref_mem.update_state(
            torch.from_numpy(src), torch.from_numpy(dst),
            torch.from_numpy(t), torch.from_numpy(raw),
        )
        nodes = jnp.asarray(np.concatenate([src, dst]), jnp.int32)
        state = ours.apply(params, state, nodes, method=TGNMemory.flush)
        state = ours.store(
            state, jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
            jnp.asarray(t, jnp.int32), jnp.asarray(raw), jnp.ones(B, bool),
        )
        np.testing.assert_allclose(
            np.asarray(state.mem[:N]), t2n(ref_mem.memory), atol=3e-5,
            err_msg=f"mean stored step {step}",
        )


def test_mean_aggregator_overflow_counter():
    """The mean aggregator is exact up to mean_slots messages/node/role/batch;
    beyond that it keeps the last K and COUNTS the drops so the divergence
    from the reference's unbounded per-batch mean is detectable at runtime."""
    import jax.numpy as jnp

    from tgm_tpu.nn.encoder.tgn import tgn_mean_init_state, tgn_mean_store_messages

    N, R, K = 5, 2, 2
    state = tgn_mean_init_state(N, 4, R, mean_slots=K)
    ones = jnp.ones(3, bool)
    raw = jnp.zeros((3, R))

    # Within capacity: every node sees <= K messages per role -> exact.
    state = tgn_mean_store_messages(
        state, jnp.asarray([0, 0, 1], jnp.int32), jnp.asarray([2, 3, 4], jnp.int32),
        jnp.asarray([1, 2, 3], jnp.int32), raw, ones,
    )
    assert int(state.overflow) == 0

    # Node 0 emits 3 src-role messages with K=2 -> exactly one drop.
    state = tgn_mean_store_messages(
        state, jnp.asarray([0, 0, 0], jnp.int32), jnp.asarray([1, 2, 3], jnp.int32),
        jnp.asarray([4, 5, 6], jnp.int32), raw, ones,
    )
    assert int(state.overflow) == 1

    # Invalid (masked) events never count.
    state = tgn_mean_store_messages(
        state, jnp.asarray([2, 2, 2], jnp.int32), jnp.asarray([0, 1, 3], jnp.int32),
        jnp.asarray([7, 8, 9], jnp.int32), raw, jnp.zeros(3, bool),
    )
    assert int(state.overflow) == 1
