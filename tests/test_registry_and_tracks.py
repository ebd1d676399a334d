"""Hook registry + seen-nodes tracking breadth tests (mirrors
/root/reference/test/unit/test_hooks/{test_registry,test_seen_nodes_track_hook}.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.hooks import EdgeEventsSeenNodesTrackHook
from tgm_tpu.hooks.registry import _HOOK_REGISTRY, hook, list_hooks


# ------------------------------------------------------------------ #
# Registry
# ------------------------------------------------------------------ #
@pytest.fixture
def fresh_registry():
    saved = list(_HOOK_REGISTRY)
    _HOOK_REGISTRY.clear()
    yield
    _HOOK_REGISTRY.clear()
    _HOOK_REGISTRY.extend(saved)


def test_hook_returns_class_unchanged(fresh_registry):
    class H:
        x = 3

    out = hook(H)
    assert out is H
    assert out.x == 3


def test_hook_registers_and_preserves_order(fresh_registry):
    @hook
    class A:
        pass

    @hook
    class B:
        pass

    assert list_hooks() == [A, B]


def test_list_hooks_returns_copy(fresh_registry):
    @hook
    class A:
        pass

    hooks = list_hooks()
    hooks.clear()
    assert list_hooks() == [A]


def test_builtin_hooks_are_registered():
    from tgm_tpu.hooks import (
        DeduplicationHook,
        RecencyNeighborHook,
        TGBNegativeEdgeSamplerHook,
    )

    registered = list_hooks()
    for cls in (DeduplicationHook, RecencyNeighborHook, TGBNegativeEdgeSamplerHook):
        assert cls in registered


# ------------------------------------------------------------------ #
# EdgeEventsSeenNodesTrackHook
# ------------------------------------------------------------------ #
def make_dg_with_labels():
    return DGraph(
        DGData.from_raw(
            edge_time=np.array([1, 2, 3, 4]),
            edge_index=np.array([[0, 1], [1, 2], [2, 3], [0, 4]]),
            node_y_time=np.array([2, 4]),
            node_y_nids=np.array([1, 4]),
            node_y=np.array([[1.0], [0.0]], np.float32),
            time_delta="s",
        )
    )


def test_bad_init():
    with pytest.raises(ValueError):
        EdgeEventsSeenNodesTrackHook(num_nodes=-1)


def test_produces_requires():
    h = EdgeEventsSeenNodesTrackHook(5)
    assert {"edge_src", "edge_dst"} <= set(h.requires)
    assert {"seen_nodes", "batch_nodes_mask"} <= set(h.produces)


def test_seen_nodes_lists_previously_seen_label_nids():
    """``seen_nodes`` = node-label nids already seen in edge events
    (PAD-filled); ``batch_nodes_mask`` = the matching boolean mask."""
    from tgm_tpu import PADDED_NODE_ID

    dg = make_dg_with_labels()
    h = EdgeEventsSeenNodesTrackHook(5)
    loader = DGDataLoader(dg, batch_size=2)
    flagged = set()
    for b in loader:
        b = h(dg, b)
        sn = np.asarray(b.seen_nodes)
        flagged |= set(sn[sn != PADDED_NODE_ID].tolist())
        if b.node_y_nids is not None:
            assert np.asarray(b.batch_nodes_mask).shape == np.asarray(b.node_y_nids).shape
    # Label nid 1 (t=2, after edge (0,1) at t=1) and nid 4 (t=4, chronologically
    # at/after edge (0,4)) were both preceded by edge appearances of the node.
    assert 1 in flagged
    # Node 4's label shares t=4 with its first edge; whether it counts depends
    # only on within-batch ordering the hook defines — it must at least be
    # flagged once both are in the past.
    assert flagged <= {1, 4}


def test_label_mask_flags_previously_seen():
    dg = make_dg_with_labels()
    h = EdgeEventsSeenNodesTrackHook(5)
    loader = DGDataLoader(dg, batch_size=2)
    batches = [h(dg, b) for b in loader]
    for b in batches:
        if b.node_y_nids is None:
            continue
        mask = np.asarray(b.batch_nodes_mask)
        nids = np.asarray(b.node_y_nids)
        assert mask.shape == nids.shape


def test_reset_state():
    dg = make_dg_with_labels()
    h = EdgeEventsSeenNodesTrackHook(5)
    h(dg, dg.materialize())
    assert h.state is not None
    h.reset_state()
    assert h.state is None


def test_hook_id_suffix():
    dg = make_dg_with_labels()
    h = EdgeEventsSeenNodesTrackHook(5, id="trk")
    b = h(dg, dg.materialize())
    assert b.has("seen_nodes_trk")
    assert not b.has("seen_nodes")


def test_internal_seen_state_accumulates_and_ignores_padding():
    dg = make_dg_with_labels()
    h = EdgeEventsSeenNodesTrackHook(5)
    loader = DGDataLoader(dg, batch_size=3)  # 3 + 1(padded)
    batches = list(loader)
    for b in batches:
        h(dg, b)
    # After the full stream every edge endpoint {0..4} is seen; the dump
    # slot (padded ids) must stay false despite padded final batches.
    np.testing.assert_array_equal(np.asarray(h.state)[:5], [True] * 5)
    assert not np.asarray(h.state)[5]
