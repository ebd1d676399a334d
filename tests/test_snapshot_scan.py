"""Scanned snapshot (DTDG) epochs: schedule semantics + scanned-vs-eager.

The merged two-loader schedule (tgm_tpu/train/snapshot.py) must replicate the
reference's eager interleave exactly (/root/reference/examples/linkproppred/
gclstm.py:187-208: first snapshot up-front, then advance while
``t_max > (snap_end + 1) * ticks``), and the scanned epoch must train to the
same parameters as the eager host loop built on the same functional cores.
"""

from __future__ import annotations

import sys
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tgm_tpu.train.snapshot import (
    merged_snapshot_schedule,
    plan_edge_max_times,
    scanned_snapshot_epoch,
)


def eager_interleave(snap_max, batch_max, conversion):
    """Host replay of the reference's interleave, as (kind, idx) steps."""
    steps = []
    si, n = 0, len(snap_max)
    snap_end = None
    if n:
        steps.append((0, 0))
        snap_end = int(snap_max[0])
        si = 1
    for b, tmax in enumerate(batch_max):
        steps.append((1, b))
        while snap_end is not None and si < n and int(tmax) > (snap_end + 1) * conversion:
            steps.append((0, si))
            snap_end = int(snap_max[si])
            si += 1
    return steps


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merged_schedule_matches_eager_semantics(seed):
    rng = np.random.default_rng(seed)
    n_snap = int(rng.integers(1, 8))
    n_batch = int(rng.integers(1, 30))
    conversion = int(rng.integers(2, 20))
    snap_max = np.sort(rng.integers(0, 12, size=n_snap))
    batch_max = np.sort(rng.integers(0, conversion * 14, size=n_batch))
    kinds, idxs = merged_snapshot_schedule(snap_max, batch_max, conversion)
    assert list(zip(kinds.tolist(), idxs.tolist())) == eager_interleave(
        snap_max, batch_max, conversion
    )
    # Every batch appears exactly once, in order.
    assert idxs[kinds == 1].tolist() == list(range(n_batch))
    # Snapshot indices are consumed in order without repeats.
    snap_seq = idxs[kinds == 0].tolist()
    assert snap_seq == sorted(set(snap_seq))


def test_schedule_no_snapshots():
    kinds, idxs = merged_snapshot_schedule(np.array([]), np.array([3, 7]), 5)
    assert kinds.tolist() == [1, 1] and idxs.tolist() == [0, 1]


def _toy_setup():
    """Tiny GCLSTM-style snapshot task with E divisible by bsize.

    (Tail batches narrower than the stream window draw different random
    negatives between eager DGDataLoader padding and the fixed stream window,
    so equivalence is asserted on an evenly divisible stream.)
    """
    import optax

    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.nn import GCLSTM, LinkPredictor

    rng = np.random.default_rng(0)
    N, E = 40, 160
    src = rng.integers(0, N, size=E)
    dst = (src + 1 + rng.integers(0, N - 1, size=E)) % N
    t = np.sort(rng.integers(0, 400, size=E))
    data = DGData.from_raw(
        edge_time=t, edge_index=np.stack([src, dst], 1), time_delta="s"
    )
    node_x = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))

    D = 16
    encoder = GCLSTM(in_channels=8, out_channels=D, K=1)
    decoder = LinkPredictor(node_dim=D, hidden_dim=D)
    opt = optax.adam(1e-3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    e4 = jnp.zeros(4, jnp.int32)
    params = {
        "enc": encoder.init(k1, node_x, e4, e4),
        "dec": decoder.init(k2, jnp.zeros((1, D)), jnp.zeros((1, D))),
    }

    def snap_apply(params, rec, sbatch):
        H, C = rec
        H2, C2 = encoder.apply(
            params["enc"], node_x, sbatch.edge_src, sbatch.edge_dst,
            None, H, C, sbatch.edge_valid,
        )
        sg = jax.lax.stop_gradient
        return sg(jax.nn.relu(H2)), (sg(H2), sg(C2))

    def init_rec():
        return (jnp.zeros((N, D)), jnp.zeros((N, D)))

    args = SimpleNamespace(
        snapshot_ticks=50, bsize=40, epochs=2, embed_dim=D, eager=False
    )
    return args, data, N, snap_apply, init_rec, decoder, opt, params


def test_scanned_matches_eager_gclstm(capsys):
    from examples._snapshot_common import run_snapshot_linkpred
    from tgm_tpu.util.seed import seed_everything

    args, data, N, snap_apply, init_rec, decoder, opt, params = _toy_setup()
    # The negative-sampler hook draws its initial key from the global seed
    # stream (fork_key); reseed before each run so both modes sample
    # identical negatives.
    seed_everything(7)
    c_scan = run_snapshot_linkpred(
        args, data, N, snap_apply, init_rec, decoder, opt, params
    )
    scan_out = capsys.readouterr().out

    args.eager = True
    seed_everything(7)
    c_eager = run_snapshot_linkpred(
        args, data, N, snap_apply, init_rec, decoder, opt, params
    )
    eager_out = capsys.readouterr().out

    # Per-epoch mean losses agree (printed to 4 decimals).
    scan_losses = [line.split("loss=")[1].split()[0] for line in scan_out.splitlines()]
    eager_losses = [line.split("loss=")[1].split()[0] for line in eager_out.splitlines()]
    assert scan_losses == eager_losses

    # Trained parameters agree.
    ps, pe = c_scan[0], c_eager[0]
    for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(pe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_plan_edge_max_times_empty_batches():
    plan = SimpleNamespace(
        edge_offsets=np.array([0, 3, 3]), edge_counts=np.array([3, 0, 2])
    )
    times = np.array([1, 4, 9, 12, 30])
    out = plan_edge_max_times(plan, times)
    assert out.tolist() == [9, 0, 30]


def test_scanned_snapshot_epoch_cond_dispatch():
    """The cond body routes each step kind to the right core."""
    kinds = np.array([0, 1, 1, 0, 1], np.int32)
    idxs = np.array([0, 0, 1, 1, 2], np.int32)

    snap_vals = jnp.asarray([10.0, 20.0])
    batch_vals = jnp.asarray([1.0, 2.0, 3.0])

    def snapshot_core(carry, sval):
        return carry + sval

    def train_core(carry, bval, idx):
        # idx is the event-batch index within the epoch (used by eval cores
        # to look up per-batch candidate rows); echo it in the count slot's
        # sanity by returning a unit count.
        return carry, (carry + bval, jnp.float32(1.0))

    epoch = scanned_snapshot_epoch(
        kinds, idxs, lambda i: snap_vals[i], lambda i: batch_vals[i],
        snapshot_core, train_core, donate_carry=False,
    )
    carry, losses, counts = epoch(jnp.float32(0.0))
    assert counts.tolist() == [0.0, 1.0, 1.0, 0.0, 1.0]
    # carry: +10 (snap) .. +20 (snap) = 30; losses on train steps use carry at
    # that point: 10+1, 10+2, 30+3.
    assert float(carry) == 30.0
    assert losses.tolist() == [0.0, 11.0, 12.0, 0.0, 33.0]
