"""Pallas recency window-select kernel: exact parity with the jnp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.hooks.neighbors import (
    recency_eid_init,
    recency_eid_query,
    recency_eid_update,
    recency_init,
    recency_query,
    recency_update,
)
from tgm_tpu.ops.pallas.recency_select import (
    recency_window_select,
    recency_window_select_eid,
)


def random_state(rng, num_nodes=20, buf=6, edge_dim=4, events=60):
    state = recency_init(num_nodes, buf, edge_dim)
    src = jnp.asarray(rng.integers(0, num_nodes, events), jnp.int32)
    dst = jnp.asarray(rng.integers(0, num_nodes, events), jnp.int32)
    t = jnp.asarray(np.sort(rng.integers(0, 500, events)), jnp.int32)
    x = jnp.asarray(rng.normal(size=(events, edge_dim)).astype(np.float32))
    # push in chronological chunks like real batches
    for i in range(0, events, 15):
        state = recency_update(state, src[i:i+15], dst[i:i+15], t[i:i+15],
                               x[i:i+15], None, directed=False)
    return state


@pytest.mark.parametrize("k", [3, 6])
def test_matches_jnp_query(k):
    rng = np.random.default_rng(0)
    state = random_state(rng)
    nbr_ids, nbr_times, nbr_feats, write_pos = state

    seeds = jnp.asarray(rng.integers(0, 20, 32), jnp.int32)
    qt = jnp.asarray(rng.integers(0, 600, 32), jnp.int32)

    want_ids, want_t, want_x = recency_query(state, seeds, qt, k)

    rows = seeds  # all valid here
    got_ids, got_t, got_x = recency_window_select(
        nbr_ids[rows], nbr_times[rows], nbr_feats[rows], write_pos[rows], qt,
        k=k, block=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x), atol=1e-6)


def test_empty_buffers():
    state = recency_init(10, 4, 3)
    nbr_ids, nbr_times, nbr_feats, write_pos = state
    seeds = jnp.arange(4, dtype=jnp.int32)
    qt = jnp.full(4, 100, jnp.int32)
    ids, t, x = recency_window_select(
        nbr_ids[seeds], nbr_times[seeds], nbr_feats[seeds], write_pos[seeds], qt,
        k=3, block=4, interpret=True,
    )
    assert np.all(np.asarray(ids) == PADDED_NODE_ID)
    assert np.all(np.asarray(t) == 0)
    assert np.all(np.asarray(x) == 0)


def test_time_boundary_strict():
    # Event exactly at query time must be excluded (strictly-before).
    state = recency_init(5, 4, 2)
    state = recency_update(
        state, jnp.array([0]), jnp.array([1]), jnp.array([10]),
        jnp.ones((1, 2)), None, directed=True,
    )
    nbr_ids, nbr_times, nbr_feats, write_pos = state
    seeds = jnp.array([0], jnp.int32)
    for qt_val, expect in [(10, PADDED_NODE_ID), (11, 1)]:
        ids, _, _ = recency_window_select(
            nbr_ids[seeds], nbr_times[seeds], nbr_feats[seeds], write_pos[seeds],
            jnp.array([qt_val], jnp.int32), k=2, block=1, interpret=True,
        )
        assert int(ids[0, -1]) == expect


@pytest.mark.parametrize("k", [3, 6])
def test_eid_kernel_matches_jnp_query(k):
    """The int-only eid kernel must match the jnp eid path bit-for-bit, and
    the selected eids must reproduce the feature-buffer path's features."""
    rng = np.random.default_rng(2)
    num_nodes, buf, edge_dim, events = 20, 6, 4, 60
    f_state = recency_init(num_nodes, buf, edge_dim)
    e_state = recency_eid_init(num_nodes, buf)
    src = jnp.asarray(rng.integers(0, num_nodes, events), jnp.int32)
    dst = jnp.asarray(rng.integers(0, num_nodes, events), jnp.int32)
    t = jnp.asarray(np.sort(rng.integers(0, 500, events)), jnp.int32)
    x = jnp.asarray(rng.normal(size=(events, edge_dim)).astype(np.float32))
    eids = jnp.arange(events, dtype=jnp.int32)
    for i in range(0, events, 15):
        f_state = recency_update(f_state, src[i:i+15], dst[i:i+15], t[i:i+15],
                                 x[i:i+15], None, directed=False)
        e_state = recency_eid_update(e_state, src[i:i+15], dst[i:i+15], t[i:i+15],
                                     eids[i:i+15], None, directed=False)

    seeds = jnp.asarray(rng.integers(0, num_nodes, 32), jnp.int32)
    qt = jnp.asarray(rng.integers(0, 600, 32), jnp.int32)

    want_ids, want_t, want_e = recency_eid_query(e_state, seeds, qt, k)
    nbr_ids, nbr_times, nbr_eids, write_pos = e_state
    got_ids, got_t, got_e = recency_window_select_eid(
        nbr_ids[seeds], nbr_times[seeds], nbr_eids[seeds], write_pos[seeds], qt,
        k=k, block=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_e), np.asarray(want_e))

    # Cross-check vs the feature-buffer path: same ids/times, and gathering
    # edge_x by the selected eids reproduces the stored features exactly.
    from tgm_tpu.hooks.neighbors import gather_edge_feats

    f_ids, f_t, f_x = recency_query(f_state, seeds, qt, k)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(f_ids))
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(f_t))
    np.testing.assert_allclose(
        np.asarray(gather_edge_feats(x, got_e)), np.asarray(f_x), atol=0
    )


@pytest.mark.parametrize("k", [3, 6])
def test_lane_major_matches_row_major(k):
    """The lane-major select (seeds on the 128-lane axis — the eval-seed-count
    variant auto-picked above LANE_SELECT_MIN_SEEDS) is bit-equal to the
    row-major kernel and the jnp path, including ragged block padding."""
    from tgm_tpu.ops.pallas.recency_select import recency_window_select_eid_lanes

    rng = np.random.default_rng(5)
    num_nodes, buf, events = 25, 6, 80
    e_state = recency_eid_init(num_nodes, buf)
    src = jnp.asarray(rng.integers(0, num_nodes, events), jnp.int32)
    dst = jnp.asarray(rng.integers(0, num_nodes, events), jnp.int32)
    t = jnp.asarray(np.sort(rng.integers(0, 500, events)), jnp.int32)
    eids = jnp.arange(events, dtype=jnp.int32)
    for i in range(0, events, 20):
        e_state = recency_eid_update(e_state, src[i:i+20], dst[i:i+20],
                                     t[i:i+20], eids[i:i+20], None,
                                     directed=False)

    S = 37  # ragged vs block=16
    seeds = jnp.asarray(rng.integers(0, num_nodes, S), jnp.int32)
    qt = jnp.asarray(rng.integers(0, 600, S), jnp.int32)
    want_ids, want_t, want_e = recency_eid_query(e_state, seeds, qt, k)

    nbr_ids, nbr_times, nbr_eids, write_pos = e_state
    got = recency_window_select_eid_lanes(
        nbr_ids[seeds], nbr_times[seeds], nbr_eids[seeds], write_pos[seeds],
        qt, k=k, block=16, interpret=True,
    )
    for g, w in zip(got, (want_ids, want_t, want_e)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_ragged_block_padding():
    # S not a multiple of block: padded rows must not leak into outputs.
    rng = np.random.default_rng(1)
    state = random_state(rng)
    nbr_ids, nbr_times, nbr_feats, write_pos = state
    seeds = jnp.asarray(rng.integers(0, 20, 13), jnp.int32)
    qt = jnp.asarray(rng.integers(0, 600, 13), jnp.int32)
    want = recency_query(state, seeds, qt, 4)
    got = recency_window_select(
        nbr_ids[seeds], nbr_times[seeds], nbr_feats[seeds], write_pos[seeds], qt,
        k=4, block=8, interpret=True,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_scatter_cells_matches_xla_scatter():
    """The in-place Pallas cell scatter (interpret mode) must match
    buf.at[rows, cols].set(vals) + dump-row reset for unique live targets."""
    from tgm_tpu.ops.pallas.scatter_cells import scatter_cells

    rng = np.random.default_rng(3)
    for _ in range(5):
        N1, B, E = 30, 6, 25
        buf = jnp.asarray(rng.integers(-5, 100, (N1, B)).astype(np.int32))
        buf = buf.at[N1 - 1].set(-1)  # pristine dump row
        # Unique live (row, col) targets + some dump-row entries.
        live = rng.permutation(np.arange((N1 - 1) * B))[: E - 5]
        rows = np.concatenate([live // B, np.full(5, N1 - 1)]).astype(np.int32)
        cols = np.concatenate([live % B, np.zeros(5)]).astype(np.int32)
        vals = rng.integers(0, 1000, E).astype(np.int32)

        want = buf.at[jnp.asarray(rows), jnp.asarray(cols)].set(
            jnp.asarray(vals), mode="drop"
        ).at[N1 - 1].set(-1)
        got = scatter_cells(
            buf, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_recency_push_pallas_scatter_matches_jnp():
    """Full push with the Pallas scatter (interpret) vs the jnp scatter."""
    import tgm_tpu.hooks.neighbors as nb
    from tgm_tpu.ops.pallas import scatter_cells as sc

    orig = sc.scatter_cells
    rng = np.random.default_rng(5)
    try:
        # Route the pallas path through interpret mode on CPU.
        sc.scatter_cells = lambda b, r, c, v: orig(b, r, c, v, interpret=True)
        N, B, E = 20, 4, 30
        src = jnp.asarray(rng.integers(0, N, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, N, E), jnp.int32)
        t = jnp.asarray(np.sort(rng.integers(0, 12, E)), jnp.int32)
        eids = jnp.asarray(rng.integers(0, 300, E), jnp.int32)
        valid = jnp.asarray(rng.random(E) > 0.25)
        outs = []
        for flag in (False, True):
            nb.USE_PALLAS_SCATTER = flag
            s = nb.recency_eid_init(N, B)
            for rep in range(3):
                s = nb.recency_eid_update(s, src, dst, t + 4 * rep, eids, valid, False)
            outs.append([np.asarray(x) for x in s])
        for a, b in zip(*outs):
            np.testing.assert_array_equal(a, b)
    finally:
        nb.USE_PALLAS_SCATTER = None
        sc.scatter_cells = orig


def test_tgn_store_scatter_1d_matches_xla_path():
    """Fused 1-D message-store kernel (interpret) vs the XLA scatter path,
    bit-exact over random batches incl. time ties and invalid events."""
    import tgm_tpu.nn.encoder.tgn as tgn_mod
    from tgm_tpu.nn.encoder.tgn import tgn_init_state, tgn_store_messages
    from tgm_tpu.ops.pallas import scatter_cells as sc

    orig = sc.tgn_store_scatter_1d
    sc.tgn_store_scatter_1d = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        rng = np.random.default_rng(0)
        N, R, E = 300, 6, 64
        for trial in range(4):
            state = tgn_init_state(N, 8, R, row_multiple=128)
            src = jnp.asarray(rng.integers(0, N, E), jnp.int32)
            dst = jnp.asarray(rng.integers(0, N, E), jnp.int32)
            t = jnp.asarray(np.sort(rng.integers(0, 50, E)), jnp.int32)
            raw = jnp.asarray(rng.normal(size=(E, R)).astype(np.float32))
            valid = jnp.asarray(rng.random(E) > 0.2)

            tgn_mod.USE_PALLAS_STORE = False
            ref = tgn_store_messages(state, src, dst, t, raw, valid)
            tgn_mod.USE_PALLAS_STORE = True
            got = tgn_store_messages(state, src, dst, t, raw, valid)
            for name in ref._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(ref, name)),
                    np.asarray(getattr(got, name)),
                    err_msg=f"{name} trial {trial}",
                )
    finally:
        sc.tgn_store_scatter_1d = orig
        tgn_mod.USE_PALLAS_STORE = None
