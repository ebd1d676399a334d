import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu import DGData, DGraph
from tgm_tpu.exceptions import (
    BadEncoderProtocolError,
    BadHookProtocolError,
    UnresolvableHookDependenciesError,
)
from tgm_tpu.hooks import HookManager, StatelessHook


class ProducerHook(StatelessHook):
    _cls_requires = set()
    _cls_produces = {"foo"}

    def __call__(self, dg, batch):
        self.add_batch_attribute(batch, "foo", jnp.ones(3))
        return batch


class ConsumerHook(StatelessHook):
    _cls_requires = {"foo"}
    _cls_produces = {"bar"}

    def __call__(self, dg, batch):
        batch.bar = batch.foo * 2
        return batch


class NegHook(StatelessHook):
    _cls_produces = {"neg"}

    def __call__(self, dg, batch):
        batch.neg = jnp.zeros(2)
        return batch


class NbrHook(StatelessHook):
    _cls_produces = {"nbr_nids"}

    def __call__(self, dg, batch):
        assert batch.has("neg"), "negatives must run before neighbor hooks"
        batch.nbr_nids = jnp.zeros((2, 2))
        return batch


@pytest.fixture
def dg(tiny_events):
    edge_time, edge_index, edge_x = tiny_events
    return DGraph(DGData.from_raw(edge_time=edge_time, edge_index=edge_index, edge_x=edge_x))


def run(hm, dg, key="train"):
    batch = dg.materialize()
    with hm.activate(key):
        return hm.execute_active_hooks(dg, batch)


def test_topo_order_dependencies(dg):
    hm = HookManager(keys=["train"])
    hm.register("train", ConsumerHook())  # registered before its producer
    hm.register("train", ProducerHook())
    batch = run(hm, dg)
    np.testing.assert_array_equal(np.asarray(batch.bar), [2, 2, 2])


def test_negatives_before_neighbors(dg):
    hm = HookManager(keys=["train"])
    hm.register("train", NbrHook())
    hm.register("train", NegHook())
    batch = run(hm, dg)  # NbrHook asserts ordering
    assert batch.has("nbr_nids")


def test_missing_dependency_raises(dg):
    hm = HookManager(keys=["train"])
    hm.register("train", ConsumerHook())
    with pytest.raises(UnresolvableHookDependenciesError):
        run(hm, dg)


def test_shared_hooks_run_for_all_keys(dg):
    hm = HookManager(keys=["a", "b"])
    hm.register_shared(ProducerHook())
    for key in ("a", "b"):
        batch = run(hm, dg, key)
        assert batch.has("foo")


def test_register_while_active_rejected(dg):
    hm = HookManager(keys=["train"])
    with hm.activate("train"):
        with pytest.raises(RuntimeError):
            hm.register("train", ProducerHook())


def test_invalid_key_and_hook(dg):
    hm = HookManager(keys=["train"])
    with pytest.raises(KeyError):
        hm.register("nope", ProducerHook())
    with pytest.raises(BadHookProtocolError):
        hm.register("train", object())
    with pytest.raises(ValueError):
        HookManager(keys=[])


def test_no_active_key_raises(dg):
    hm = HookManager(keys=["train"])
    with pytest.raises(RuntimeError):
        hm.execute_active_hooks(dg, dg.materialize())


def test_activate_restores_previous_key(dg):
    hm = HookManager(keys=["a", "b"])
    hm.set_active_hooks("a")
    with hm.activate("b"):
        assert hm.active_key == "b"
    assert hm.active_key == "a"


def test_validate_requirement(dg):
    class Encoder:
        requires = {"foo"}

        def __call__(self, batch):
            return batch

    hm = HookManager(keys=["train"])
    hm.register("train", ProducerHook())
    hm.validate_requirement(Encoder())  # satisfied

    class BadEncoder:
        requires = {"fooo"}  # typo

        def __call__(self, batch):
            return batch

    with pytest.raises(UnresolvableHookDependenciesError) as ei:
        hm.validate_requirement(BadEncoder())
    assert "foo" in str(ei.value)  # fuzzy suggestion

    with pytest.raises(BadEncoderProtocolError):
        hm.validate_requirement(object())


def test_id_suffixing(dg):
    hm = HookManager(keys=["train"])
    hm.register("train", ProducerHook(id="x"))
    batch = run(hm, dg)
    assert not batch.has("foo")
    assert batch.has("foo_x")
