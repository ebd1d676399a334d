"""Multi-host (multi-process) simulation of the sharded TGN train step.

The reference has no distributed runtime at all (SURVEY.md §2.2); our SPMD
layer is normally validated on a single-process virtual mesh. This tool goes
one step further and exercises the REAL multi-host path on CPU: it spawns N
OS processes, each owning 4 virtual CPU devices, initializes the JAX
distributed runtime through ``tgm_tpu.parallel.initialize_distributed``
(coordinator + Gloo cross-process collectives), builds one GLOBAL mesh over
all N*4 devices, and runs several sharded TGN train steps where every carry
leaf is a true multi-process ``jax.Array`` (assembled shard-by-shard with
``make_array_from_callback``). Process 0 replays the same steps on a single
device and asserts loss agreement, then writes MULTIHOST_r02.json.

Usage:
    python tools/multihost_sim.py                  # launcher: spawns workers
    python tools/multihost_sim.py --process-id K   # (internal) worker K
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

LOCAL_DEVICES = 4


def worker(process_id: int, num_processes: int, port: int, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tgm_tpu.parallel import (
        batch_shardings,
        initialize_distributed,
        make_mesh,
        tgn_carry_shardings,
    )

    # The library's own multi-host entry point (parallel/mesh.py).
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = jax.device_count()
    assert n_global == num_processes * LOCAL_DEVICES

    import numpy as np

    from __graft_entry__ import _tiny_setup

    # Deterministic identical construction in every process.
    pipe, batch = _tiny_setup(batch_size=16, row_multiple=n_global)
    carry = pipe.init_carry(jax.random.PRNGKey(0))

    mesh = make_mesh(devices=jax.devices())
    carry_sh = tgn_carry_shardings(mesh, carry)
    batch_sh = batch_shardings(mesh, batch)

    def globalize(x, sharding):
        full = np.asarray(x)
        return jax.make_array_from_callback(
            full.shape, sharding, lambda idx: full[idx]
        )

    gcarry = jax.tree_util.tree_map(globalize, carry, carry_sh)
    gbatch = jax.tree_util.tree_map(globalize, batch, batch_sh)

    step = jax.jit(pipe.train_step)
    losses = []
    for _ in range(3):
        gcarry, loss = step(gcarry, gbatch)
        # loss is fully replicated -> addressable on every process.
        losses.append(float(jax.device_get(jax.jit(lambda x: x)(loss))))

    if process_id == 0:
        # Single-device replay (fresh pipeline, no mesh) for equivalence.
        pipe1, batch1 = _tiny_setup(batch_size=16)
        carry1 = pipe1.init_carry(jax.random.PRNGKey(0))
        step1 = jax.jit(pipe1.train_step)
        ref = []
        for _ in range(3):
            carry1, l1 = step1(carry1, batch1)
            ref.append(float(l1))
        diffs = [abs(a - b) for a, b in zip(losses, ref)]
        rec = {
            "num_processes": num_processes,
            "local_devices": LOCAL_DEVICES,
            "global_devices": n_global,
            "collective_backend": "gloo (cross-process CPU)",
            "losses_multiprocess": losses,
            "losses_single_device": ref,
            "max_abs_diff": max(diffs),
            "ok": bool(max(diffs) < 5e-4),
        }
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[0] multihost sim: {rec['ok']} max_abs_diff={rec['max_abs_diff']:.2e}")
    jax.distributed.shutdown()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--port", type=int, default=12757)
    p.add_argument("--out", type=str, default=str(REPO / "MULTIHOST_r02.json"))
    args = p.parse_args()

    if args.process_id is not None:
        worker(args.process_id, args.num_processes, args.port, args.out)
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # strip the axon sitecustomize (forces TPU)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--process-id", str(i),
             "--num-processes", str(args.num_processes),
             "--port", str(args.port), "--out", args.out],
            env=env,
        )
        for i in range(args.num_processes)
    ]
    codes = [q.wait() for q in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    with open(args.out) as f:
        print(f.read())


if __name__ == "__main__":
    main()
