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


# ------------------------------------------------------------------ #
# Additional surface coverage (mirrors reference test_hook_manager.py)
# ------------------------------------------------------------------ #
def test_empty_keys_rejected():
    with pytest.raises(ValueError):
        HookManager(keys=[])


def test_str_lists_hooks_and_active_key(dg):
    hm = HookManager(keys=["train"])
    hm.register("train", ProducerHook())
    hm.register_shared(ConsumerHook())
    s = str(hm)
    assert "ProducerHook" in s and "ConsumerHook" in s
    assert "Active key: None" in s
    with hm.activate("train"):
        assert "Active key: train" in str(hm)


def test_resolve_hooks_by_key_only(dg):
    hm = HookManager(keys=["a", "b"])
    hm.register("a", ConsumerHook())
    hm.register("a", ProducerHook())
    hm.register("b", ProducerHook())
    hm.resolve_hooks("a")
    # 'a' resolved: producer ordered before consumer.
    order = [type(h).__name__ for h in hm._key_to_hooks["a"]]
    assert order.index("ProducerHook") < order.index("ConsumerHook")
    assert hm._dirty["a"] is False
    assert hm._dirty["b"] is True  # untouched


def test_resolve_hooks_bad_key():
    hm = HookManager(keys=["a"])
    with pytest.raises(KeyError):
        hm.resolve_hooks("nope")


def test_registration_invalidates_resolution(dg):
    hm = HookManager(keys=["a"])
    hm.register("a", ProducerHook())
    hm.resolve_hooks("a")
    assert hm._dirty["a"] is False
    hm.register("a", ConsumerHook())
    assert hm._dirty["a"] is True  # new hook re-dirties the key
    hm.resolve_hooks("a")
    order = [type(h).__name__ for h in hm._key_to_hooks["a"]]
    assert order.index("ProducerHook") < order.index("ConsumerHook")


def test_register_shared_while_active_rejected(dg):
    hm = HookManager(keys=["a"])
    with hm.activate("a"):
        with pytest.raises(RuntimeError):
            hm.register_shared(ProducerHook())


def test_reset_state_by_key():
    class Stateful(ProducerHook):
        has_state = True

        def __init__(self):
            super().__init__()
            self.reset_count = 0

        def reset_state(self):
            self.reset_count += 1

    hm = HookManager(keys=["a", "b"])
    ha, hb = Stateful(), Stateful()
    hm.register("a", ha)
    hm.register("b", hb)
    hm.reset_state("a")
    assert ha.reset_count == 1 and hb.reset_count == 0
    hm.reset_state()
    assert ha.reset_count == 2 and hb.reset_count == 1
    with pytest.raises(KeyError):
        hm.reset_state("nope")


def test_validate_requirement_passes_without_requirements(dg):
    class Enc:
        requires = set()

        def __call__(self, batch):
            return batch

    hm = HookManager(keys=["a"])
    hm.validate_requirement(Enc())  # must not raise


def test_validate_requirement_suggestion_variants(dg):
    hm = HookManager(keys=["a"])
    hm.register("a", ProducerHook())

    class Enc:
        def __init__(self, req):
            self.requires = req

        def __call__(self, batch):
            return batch

    # Close match (typo) -> "Do you mean".
    with pytest.raises(UnresolvableHookDependenciesError, match="Do you mean"):
        hm.validate_requirement(Enc({"fooo"}))
    # Registry keyword match -> names a hook class that produces it.
    with pytest.raises(
        UnresolvableHookDependenciesError, match="NegativeEdgeSamplerHook"
    ):
        hm.validate_requirement(Enc({"neg_batch_list"}))
    # Completely unknown -> explicit no-match message.
    with pytest.raises(UnresolvableHookDependenciesError, match="Can not find"):
        hm.validate_requirement(Enc({"zzz_unknown_attr"}))


def test_execute_runs_keyed_after_shared(dg):
    hm = HookManager(keys=["a"])
    hm.register_shared(ProducerHook())
    hm.register("a", ConsumerHook())
    batch = dg.materialize()
    with hm.activate("a"):
        out = hm.execute_active_hooks(dg, batch)
    np.testing.assert_allclose(np.asarray(out.bar), 2.0)
