import json
import logging

import numpy as np
import pytest

from tgm_tpu.util.logging import (
    enable_logging,
    log_latency,
    log_metric,
    pretty_number_format,
)
from tgm_tpu.util.seed import fork_key, seed_everything


def test_pretty_number_format():
    assert pretty_number_format(1_234_567) == "1.23M"
    assert pretty_number_format(999) == "999"
    assert pretty_number_format(2_500) == "2.50K"
    assert pretty_number_format(3.25e9) == "3.25B"
    assert pretty_number_format(0.1234) == "0.1234"
    assert pretty_number_format("abc") == "abc"


def test_log_metric_json_contract(tmp_path):
    log_file = tmp_path / "run.log"
    enable_logging(log_level=logging.INFO, log_file_path=str(log_file))
    log_metric("test_metric", 42.5, epoch=3)

    @log_latency
    def slow():
        return 1

    slow()
    for h in logging.getLogger("tgm_tpu").handlers:
        h.flush()
    lines = log_file.read_text().splitlines()
    records = []
    for line in lines:
        idx = line.find("{")
        if idx >= 0:
            try:
                records.append(json.loads(line[idx:]))
            except json.JSONDecodeError:
                pass
    metrics = {r["metric"]: r for r in records if "metric" in r}
    assert metrics["test_metric"]["value"] == 42.5
    assert metrics["test_metric"]["epoch"] == 3
    assert any(k.startswith("latency_") for k in metrics)


def test_log_parser_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.log_parser import parse_log, report

    log_file = tmp_path / "m.log"
    log_file.write_text(
        '{"metric": "loss", "value": 1.0}\n'
        'INFO:tgm:{"metric": "loss", "value": 3.0}\n'
        "not json\n"
        '{"metric": "mrr", "value": 0.5}\n'
    )
    parsed = parse_log(str(log_file))
    assert parsed["loss"] == [1.0, 3.0]
    rep = report(str(log_file))
    assert rep["loss"]["mean"] == 2.0
    assert rep["mrr"]["count"] == 1
    # A/B compare
    base = tmp_path / "b.log"
    base.write_text('{"metric": "loss", "value": 4.0}\n')
    rep2 = report(str(log_file), str(base))
    assert rep2["loss"]["vs_baseline_mean"] == pytest.approx(0.5)


def test_seed_reproducibility():
    seed_everything(123)
    a = np.asarray(fork_key())
    seed_everything(123)
    b = np.asarray(fork_key())
    np.testing.assert_array_equal(a, b)
    c = np.asarray(fork_key())
    assert not np.array_equal(b, c)  # keys advance


def test_recipe_registry():
    from tgm_tpu.exceptions import UndefinedRecipeError
    from tgm_tpu.hooks import RecipeRegistry

    @RecipeRegistry.register("unit-test-recipe")
    def build(x):
        return x * 2

    assert RecipeRegistry.build("unit-test-recipe", x=21) == 42
    with pytest.raises(UndefinedRecipeError):
        RecipeRegistry.build("nope")


def test_tgb_link_pred_recipe(tiny_events):
    import numpy as np

    from tgm_tpu import DGData, DGraph
    from tgm_tpu.constants import RECIPE_TGB_LINK_PRED
    from tgm_tpu.hooks import RecipeRegistry

    edge_time, edge_index, edge_x = tiny_events
    dg = DGraph(DGData.from_raw(edge_time=edge_time, edge_index=edge_index))
    hm = RecipeRegistry.build(
        RECIPE_TGB_LINK_PRED,
        dataset_name="synthetic",
        train_dg=dg,
        val_candidates=np.zeros((8, 3), np.int64),
        test_candidates=np.zeros((8, 3), np.int64),
    )
    assert hm.keys == ["train", "val", "test"]
    batch = dg.materialize()
    with hm.activate("train"):
        out = hm.execute_active_hooks(dg, batch)
    assert out.has("neg")


def test_batch_pytree_roundtrip(tiny_events):
    import jax
    import jax.numpy as jnp

    from tgm_tpu import DGData, DGraph

    edge_time, edge_index, edge_x = tiny_events
    dg = DGraph(DGData.from_raw(edge_time=edge_time, edge_index=edge_index, edge_x=edge_x))
    b = dg.materialize(pad_edges_to=10)
    b.custom = jnp.ones(3)
    b.nested = [jnp.zeros(2), jnp.ones(2)]

    leaves, treedef = jax.tree_util.tree_flatten(b)
    b2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert b2.has("custom") and b2.has("nested")
    np.testing.assert_array_equal(np.asarray(b2.edge_src), np.asarray(b.edge_src))

    # Batches survive jit boundaries with extras intact.
    @jax.jit
    def bump(batch):
        batch.custom = batch.custom + 1
        return batch

    b3 = bump(b2)
    np.testing.assert_array_equal(np.asarray(b3.custom), [2, 2, 2])


def test_storage_backend_registry():
    from tgm_tpu.core import (
        DGStorageArrayBackend,
        get_dg_storage_backend,
        set_dg_storage_backend,
    )

    assert get_dg_storage_backend() is DGStorageArrayBackend
    set_dg_storage_backend("ArrayBackend")
    assert get_dg_storage_backend() is DGStorageArrayBackend
    with pytest.raises(ValueError):
        set_dg_storage_backend("NoSuchBackend")
    with pytest.raises(ValueError):
        set_dg_storage_backend(42)
