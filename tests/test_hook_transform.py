"""HookManager.as_transform: the functional pipeline export matches eager
hook execution and runs under jit/scan."""

import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.hooks import HookManager, RandomNegativeEdgeSamplerHook, RecencyNeighborHook
from tgm_tpu.util.seed import seed_everything


def build(seed=5):
    rng = np.random.default_rng(0)
    E = 64
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 200, E)),
        edge_index=rng.integers(0, 12, (E, 2)),
        edge_x=rng.normal(size=(E, 3)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=12))
    hm.register(
        "train",
        RecencyNeighborHook(12, [4], ["edge_src", "edge_dst", "neg"],
                            ["edge_time", "edge_time", "neg_time"], edge_dim=3),
    )
    return dg, hm


def test_transform_matches_eager():
    dg, hm = build()
    seed_everything(42)
    fn, states = hm.as_transform("train", dg)
    batches = list(DGDataLoader(dg, batch_size=16))

    out_t = []
    for b in batches:
        states, ob = fn(states, b)
        out_t.append(np.asarray(ob.nbr_nids[0]))

    # Eager manager path with the same seed.
    dg2, hm2 = build()
    seed_everything(42)
    with hm2.activate("train"):
        out_e = [
            np.asarray(hm2.execute_active_hooks(dg2, b).nbr_nids[0])
            for b in DGDataLoader(dg2, batch_size=16)
        ]
    for a, b in zip(out_t, out_e):
        np.testing.assert_array_equal(a, b)


def test_transform_is_jittable():
    dg, hm = build()
    seed_everything(7)
    fn, states = hm.as_transform("train", dg)
    jfn = jax.jit(fn)
    for b in DGDataLoader(dg, batch_size=16):
        states, ob = jfn(states, b)
    assert ob.has("neg") and ob.has("nbr_nids")
    assert np.isfinite(np.asarray(ob.nbr_edge_x[0])).all()
