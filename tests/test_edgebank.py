import numpy as np
import pytest

from tgm_tpu.nn.modules.edgebank import EdgeBankPredictor


def dict_reference(src, dst, ts, queries, window_start=None):
    """Tiny dict-based oracle mirroring the reference semantics."""
    mem = {}
    for s, d, t in zip(src, dst, ts):
        mem[(s, d)] = t
    out = []
    for s, d in queries:
        t = mem.get((s, d))
        if t is None:
            out.append(0.0)
        elif window_start is not None and t < window_start:
            out.append(0.0)
        else:
            out.append(1.0)
    return np.array(out, dtype=np.float32)


def test_unlimited_membership():
    src = np.array([0, 1, 2, 0])
    dst = np.array([1, 2, 3, 2])
    ts = np.array([1, 2, 3, 4])
    eb = EdgeBankPredictor(src, dst, ts)
    queries = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (1, 0)]
    got = eb(np.array([q[0] for q in queries]), np.array([q[1] for q in queries]))
    np.testing.assert_array_equal(got, dict_reference(src, dst, ts, queries))


def test_update_extends_memory():
    eb = EdgeBankPredictor(np.array([0]), np.array([1]), np.array([1]))
    assert eb(np.array([5]), np.array([6]))[0] == 0.0
    eb.update(np.array([5]), np.array([6]), np.array([2]))
    assert eb(np.array([5]), np.array([6]))[0] == 1.0


def test_fixed_window_eviction():
    # span 0..100, ratio 0.5 -> window [50, 100]
    src = np.array([0, 1])
    dst = np.array([1, 2])
    ts = np.array([0, 100])
    eb = EdgeBankPredictor(src, dst, ts, memory_mode="fixed", window_ratio=0.5)
    got = eb(np.array([0, 1]), np.array([1, 2]))
    np.testing.assert_array_equal(got, [0.0, 1.0])  # (0,1)@0 outside window

    # advancing time slides the window forward: window size stays 50
    eb.update(np.array([2]), np.array([3]), np.array([200]))
    got = eb(np.array([1, 2]), np.array([2, 3]))
    np.testing.assert_array_equal(got, [0.0, 1.0])  # (1,2)@100 < 150 evicted


def test_matches_oracle_random_stream():
    rng = np.random.default_rng(0)
    E, N = 2000, 50
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    ts = np.sort(rng.integers(0, 10000, E))
    eb = EdgeBankPredictor(src[:1000], dst[:1000], ts[:1000])
    # stream the rest in chunks, querying before updating
    for i in range(1000, E, 250):
        s, d, t = src[i : i + 250], dst[i : i + 250], ts[i : i + 250]
        q = list(zip(s.tolist(), d.tolist()))
        expect = dict_reference(src[:i], dst[:i], ts[:i], q)
        got = eb(s, d)
        np.testing.assert_array_equal(got, expect)
        eb.update(s, d, t)


def test_validation():
    with pytest.raises(ValueError):
        EdgeBankPredictor(np.array([]), np.array([]), np.array([]))
    with pytest.raises(ValueError):
        EdgeBankPredictor(np.array([0]), np.array([1]), np.array([1]), memory_mode="bogus")
    with pytest.raises(ValueError):
        EdgeBankPredictor(np.array([0]), np.array([1]), np.array([1]), window_ratio=0)


def test_example_end_to_end():
    """Run the EdgeBank example as a user would (1 small synthetic epoch)."""
    import subprocess
    import sys
    from pathlib import Path

    import os

    root = Path(__file__).resolve().parents[1]
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    # Drop the TPU-tunnel sitecustomize path: it force-registers the remote
    # platform in every subprocess, which is slow and irrelevant for this test.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
    )
    out = subprocess.run(
        [sys.executable, str(root / "examples/linkproppred/edgebank.py"),
         "--dataset", "synthetic-200-3000", "--bsize", "100"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr
    assert "test_mrr=" in out.stdout
    mrr_val = float(out.stdout.split("test_mrr=")[1].split()[0])
    assert 0.0 <= mrr_val <= 1.0
