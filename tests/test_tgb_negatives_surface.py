"""TGB negative-sampler hook surface tests (tgbl / thgl / tkgl).

Mirrors the reference's TGB-hook unit coverage
(/root/reference/test/unit/test_hooks/test_tgb_negative_sampling_hook.py)
for the behaviors that do not need the tgb package: init validation, the
candidates-array path, unique-set semantics, per-instance ids, cursor
advancement, and reset.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu import DGData, DGDataLoader, DGraph, PADDED_NODE_ID
from tgm_tpu.hooks import (
    TGBNegativeEdgeSamplerHook,
    TGBTHGNegativeEdgeSamplerHook,
    TGBTKGNegativeEdgeSamplerHook,
)

HOOKS = [
    TGBNegativeEdgeSamplerHook,
    TGBTHGNegativeEdgeSamplerHook,
    TGBTKGNegativeEdgeSamplerHook,
]


@pytest.fixture
def dg():
    rng = np.random.default_rng(0)
    E = 10
    return DGraph(
        DGData.from_raw(
            edge_time=np.arange(E),
            edge_index=rng.integers(0, 8, (E, 2)),
            time_delta="s",
        )
    )


@pytest.mark.parametrize("cls", HOOKS)
def test_init_requires_args(cls):
    with pytest.raises(ValueError):
        cls()  # neither (dataset, split) nor candidates


@pytest.mark.parametrize("cls", HOOKS)
def test_init_bad_split_mode(cls):
    with pytest.raises(ValueError):
        cls(f"{cls._dataset_prefix}-foo", split_mode="train")


@pytest.mark.parametrize("cls", HOOKS)
def test_init_wrong_dataset_prefix(cls):
    wrong = {"tgbl": "tkgl", "thgl": "tgbl", "tkgl": "thgl"}[cls._dataset_prefix]
    with pytest.raises(ValueError):
        cls(f"{wrong}-foo", split_mode="val")


@pytest.mark.parametrize("cls", HOOKS)
def test_candidates_must_be_2d(cls):
    with pytest.raises(ValueError):
        cls(candidates=np.arange(10))


@pytest.mark.parametrize("cls", HOOKS)
def test_candidates_path_serves_rows_in_order(cls, dg):
    E, Q = dg.num_edge_events, 3
    cands = np.arange(E * Q).reshape(E, Q) % 8
    h = cls(candidates=cands)
    loader = DGDataLoader(dg, batch_size=4)
    row = 0
    for b in loader:
        b = h(dg, b)
        valid = np.asarray(b.edge_valid)
        served = np.asarray(b.neg_batch_list)
        for i in range(valid.shape[0]):
            if valid[i]:
                np.testing.assert_array_equal(served[i], cands[row])
                row += 1
            else:
                assert (served[i] == PADDED_NODE_ID).all()
    assert row == E


def test_neg_is_sorted_unique_padded(dg):
    cands = np.array([[5, 3, 5], [3, 3, 1]] * 5)  # duplicates within + across
    h = TGBNegativeEdgeSamplerHook(candidates=cands)
    b = h(dg, dg.materialize())
    neg = np.asarray(b.neg)
    live = neg[neg != PADDED_NODE_ID]
    np.testing.assert_array_equal(live, np.unique(cands))  # sorted unique
    assert (neg[len(live):] == PADDED_NODE_ID).all()  # padding at the end
    assert neg.shape[0] == cands.shape[0] * cands.shape[1]  # static capacity


def test_hook_id_suffixes_produced_keys(dg):
    h = TGBNegativeEdgeSamplerHook(candidates=np.zeros((10, 2)), id="v1")
    b = h(dg, dg.materialize())
    assert b.has("neg_v1") and b.has("neg_batch_list_v1")
    assert not b.has("neg")


def test_reset_state_restarts_cursor(dg):
    E, Q = dg.num_edge_events, 2
    cands = np.arange(E * Q).reshape(E, Q)
    h = TGBNegativeEdgeSamplerHook(candidates=cands)
    loader = DGDataLoader(dg, batch_size=5)
    first = h(dg, next(iter(loader)))
    h.reset_state()
    again = h(dg, next(iter(loader)))
    np.testing.assert_array_equal(
        np.asarray(first.neg_batch_list), np.asarray(again.neg_batch_list)
    )


def test_neg_time_within_batch_range(dg):
    cands = np.full((10, 2), 3)
    h = TGBNegativeEdgeSamplerHook(candidates=cands)
    b = h(dg, dg.materialize())
    nt = np.asarray(b.neg_time)
    neg = np.asarray(b.neg)
    t = np.asarray(b.edge_time)
    live = neg != PADDED_NODE_ID
    assert (nt[live] >= t.min()).all() and (nt[live] <= t.max()).all()
    assert (nt[~live] == 0).all()
