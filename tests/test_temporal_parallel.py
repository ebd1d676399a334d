"""Temporal-axis parallelism: exact chain mode + stale-merge consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu.parallel.temporal import (
    chain_epoch,
    merge_stale_carries,
    split_spans,
    stale_parallel_epoch,
    stale_resync_epoch,
)


def test_split_spans():
    assert split_spans(10, 3) == [(0, 4), (4, 7), (7, 10)]
    assert split_spans(8, 4) == [(0, 2), (2, 4), (4, 6), (6, 8)]
    assert split_spans(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]


def _setup(num_batches=8, bsize=16):
    import numpy as np

    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline

    rng = np.random.default_rng(0)
    E = num_batches * bsize
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 1000, E)),
        edge_index=rng.integers(0, 32, (E, 2)),
        edge_x=rng.normal(size=(E, 4)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, bsize)
    pipe = TGNPipeline(num_nodes=32, edge_dim=4, memory_dim=8, embed_dim=8,
                       time_dim=4, num_nbrs=3, neg_high=32)
    return pipe, stream


def test_chain_equals_plain_scan():
    pipe, stream = _setup()
    carry0 = pipe.init_carry(jax.random.PRNGKey(0))

    def plain(carry):
        def body(c, i):
            return pipe.train_step(c, stream.batch_at(i))

        return jax.lax.scan(body, carry, jnp.arange(stream.num_batches))

    c_plain, l_plain = jax.jit(plain)(carry0)
    c_chain, l_chain = jax.jit(
        lambda c: chain_epoch(pipe.train_step, stream.batch_at, c, stream.num_batches, 4)
    )(carry0)
    np.testing.assert_allclose(np.asarray(l_plain), np.asarray(l_chain), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(c_plain.mem_state),
                    jax.tree_util.tree_leaves(c_chain.mem_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_stale_parallel_and_merge():
    pipe, stream = _setup()
    carry0 = pipe.init_carry(jax.random.PRNGKey(0))
    n_spans = 4
    carries, losses = jax.jit(
        lambda c: stale_parallel_epoch(
            pipe.train_step, stream.batch_at, c, stream.num_batches, n_spans
        )
    )(carry0)
    assert losses.shape == (n_spans, stream.num_batches // n_spans)
    assert np.isfinite(np.asarray(losses)).all()

    merged = merge_stale_carries(carries, num_nodes=32)
    # Merged state has the single-carry structure and finite values.
    for a, b in zip(jax.tree_util.tree_leaves(merged.mem_state),
                    jax.tree_util.tree_leaves(carry0.mem_state)):
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.isfinite(np.asarray(a, dtype=np.float64)).all()
    # Owner-wise pick: every merged last_update equals the max across spans
    # for that node.
    lu_all = np.asarray(carries.mem_state.last_update)
    np.testing.assert_array_equal(
        np.asarray(merged.mem_state.last_update), lu_all.max(axis=0)
    )


def test_stale_resync_single_span_is_sequential():
    """n_spans=1 with any round count is the exact sequential schedule up to
    the merge's parameter 'average' over one span (identity)."""
    pipe, stream = _setup()
    carry0 = pipe.init_carry(jax.random.PRNGKey(0))

    def plain(carry):
        def body(c, i):
            return pipe.train_step(c, stream.batch_at(i))

        return jax.lax.scan(body, carry, jnp.arange(stream.num_batches))

    _, ref_losses = jax.jit(plain)(carry0)
    carry, round_losses = jax.jit(
        lambda c: stale_resync_epoch(
            pipe.train_step, stream.batch_at, c, stream.num_batches,
            n_spans=1, num_nodes=32, resync_rounds=4,
        )
    )(carry0)
    got = np.concatenate([np.asarray(r).ravel() for r in round_losses])
    np.testing.assert_allclose(got, np.asarray(ref_losses), rtol=1e-6, atol=1e-6)


def test_stale_resync_runs_and_merges():
    pipe, stream = _setup()
    carry0 = pipe.init_carry(jax.random.PRNGKey(0))
    carry, round_losses = jax.jit(
        lambda c: stale_resync_epoch(
            pipe.train_step, stream.batch_at, c, stream.num_batches,
            n_spans=2, num_nodes=32, resync_rounds=2,
        )
    )(carry0)
    assert len(round_losses) == 2
    for r in round_losses:
        assert np.isfinite(np.asarray(r)).all()
    for a, b in zip(jax.tree_util.tree_leaves(carry.mem_state),
                    jax.tree_util.tree_leaves(carry0.mem_state)):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_pipelined_eval_exact():
    """Pipelined span-handoff eval == sequential eval scan, bit-exact."""
    from tgm_tpu.parallel.temporal import pipelined_eval_epoch

    pipe, stream = _setup(num_batches=7, bsize=16)  # uneven spans on purpose
    carry0 = pipe.flush_all(pipe.init_carry(jax.random.PRNGKey(0)))
    nb = stream.num_batches
    Q = 5
    cands = jax.random.randint(
        jax.random.PRNGKey(1), (nb * 16, Q), 0, 32, dtype=jnp.int32
    )

    def score_fn(c, i):
        rows = jax.lax.dynamic_slice(cands, (i * 16, 0), (16, Q))
        return pipe.eval_step(c, stream.batch_at(i), rows)

    def advance_fn(c, i):
        return pipe.eval_advance_state(c, stream.batch_at(i))

    def chain(c):
        return jax.lax.scan(score_fn, c, jnp.arange(nb))

    c_chain, (sum_chain, cnt_chain) = jax.jit(chain)(carry0)

    outs, valid = jax.jit(
        lambda c: pipelined_eval_epoch(advance_fn, score_fn, c, nb, 3)
    )(carry0)
    sums, cnts = outs
    v = np.asarray(valid)
    got_sums = np.asarray(sums)[v]
    got_cnts = np.asarray(cnts)[v]
    # Spans are contiguous and in order, so the masked concat is the epoch.
    np.testing.assert_array_equal(got_sums, np.asarray(sum_chain))
    np.testing.assert_array_equal(got_cnts, np.asarray(cnt_chain))


def test_eval_advance_state_matches_eval_step_state():
    """advance_fn evolves the carry exactly as the full eval step."""
    pipe, stream = _setup(num_batches=4, bsize=16)
    carry = pipe.flush_all(pipe.init_carry(jax.random.PRNGKey(0)))
    Q = 5
    cands = jax.random.randint(jax.random.PRNGKey(1), (16, Q), 0, 32,
                               dtype=jnp.int32)
    b = stream.batch_at(0)
    c_full, _ = jax.jit(lambda c: pipe.eval_step(c, b, cands))(carry)
    c_adv = jax.jit(lambda c: pipe.eval_advance_state(c, b))(carry)
    for a, bb in zip(jax.tree_util.tree_leaves(c_full.mem_state),
                     jax.tree_util.tree_leaves(c_adv.mem_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    for a, bb in zip(jax.tree_util.tree_leaves(c_full.rec_state),
                     jax.tree_util.tree_leaves(c_adv.rec_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_tgat_pipeline_scan_learns():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.train import DeviceEdgeStream, TGATPipeline, jit_scan_epoch

    rng = np.random.default_rng(0)
    E, N = 256, 24
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 500, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, 4)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, 32)
    node_x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pipe = TGATPipeline(num_nodes=N, edge_dim=4, node_x=node_x, num_nbrs=(4, 3),
                        time_dim=8, embed_dim=16, lr=1e-3, neg_high=N)
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches)
    carry, l1 = epoch(carry)
    carry, l2 = epoch(carry)
    carry, l3 = epoch(carry)
    assert np.isfinite(np.asarray(l3)).all()
    assert float(np.asarray(l3).mean()) < float(np.asarray(l1).mean())
