"""End-to-end TGN training-trajectory parity vs the torch reference.

Drives tools/parity_harness.py on a small synthetic stream: the reference
library's full TGN example pipeline (torch CPU) and tgm_tpu's hook-manager
pipeline run with identical weights/negatives for two epochs; per-batch
losses and val/test MRR must agree within tight fp-accumulation bands.

This is the composition-level evidence (hook ordering, staging-vs-commit
ordering, negative semantics, padding) that the per-module parity tests in
test_reference_parity.py / test_reference_tgn_parity.py cannot provide.
Reference path under test: /root/reference/examples/linkproppred/tgn.py:57-254.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def parity_result():
    from tools.parity_harness import ParityConfig, run_parity

    cfg = ParityConfig(
        n_nodes=120, n_edges=800, bsize=100, epochs=2, n_cands=5,
        memory_dim=16, time_dim=8, embed_dim=16,
    )
    return run_parity(cfg)


def test_loss_trajectory_parity(parity_result):
    r = parity_result
    assert r["n_epochs"] == 2
    assert r["loss_max_abs_diff"] < 5e-3, r
    # The first step uses the copied initial weights verbatim.
    assert abs(r["loss_first_batch"][0] - r["loss_first_batch"][1]) < 1e-4, r


def test_val_mrr_parity(parity_result):
    assert parity_result["val_mrr_max_abs_diff"] < 0.01, parity_result


def test_test_mrr_parity(parity_result):
    assert parity_result["test_mrr_abs_diff"] < 0.02, parity_result


@pytest.fixture(scope="module")
def tgat_parity_result():
    from tools.parity_harness import ParityConfig, run_parity_tgat

    cfg = ParityConfig(
        n_nodes=120, n_edges=800, bsize=100, epochs=2, n_cands=5,
        embed_dim=16, time_dim=8,
    )
    return run_parity_tgat(cfg, n_nbrs=(4, 4))


def test_tgat_training_parity(tgat_parity_result):
    """Reference path: /root/reference/examples/linkproppred/tgat.py:55-210
    (2-hop recency sampling, joint chunked forward, candidate-list eval)."""
    r = tgat_parity_result
    assert abs(r["loss_first_batch"][0] - r["loss_first_batch"][1]) < 1e-4, r
    assert r["loss_max_abs_diff"] < 1e-2, r
    assert r["val_mrr_max_abs_diff"] < 0.03, r
    assert r["test_mrr_abs_diff"] < 0.03, r
