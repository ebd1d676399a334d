import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu.eval.metrics import binary_accuracy, mrr, mrr_per_edge, ndcg_at_k


def test_mrr_perfect():
    pos = jnp.array([10.0, 10.0])
    neg = jnp.zeros((2, 5))
    np.testing.assert_allclose(np.asarray(mrr_per_edge(pos, neg)), [1.0, 1.0])


def test_mrr_worst():
    pos = jnp.array([0.0])
    neg = jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(mrr_per_edge(pos, neg)), [1 / 5])


def test_mrr_tgb_tie_handling():
    # One tie: optimistic rank 0, pessimistic 1 -> rank 1.5 -> rr 2/3
    pos = jnp.array([5.0])
    neg = jnp.array([[5.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(mrr_per_edge(pos, neg)), [2 / 3])


def test_mrr_mask():
    pos = jnp.array([1.0])
    neg = jnp.array([[2.0, 2.0, 2.0]])
    valid = jnp.array([[True, False, False]])
    np.testing.assert_allclose(np.asarray(mrr_per_edge(pos, neg, valid)), [0.5])


def test_mrr_edge_valid():
    pos = jnp.array([10.0, 0.0])
    neg = jnp.array([[0.0], [1.0]])
    ev = jnp.array([True, False])
    assert float(mrr(pos, neg, edge_valid=ev)) == 1.0


def test_ndcg_perfect_and_reversed():
    labels = jnp.array([[3.0, 2.0, 1.0, 0.0]])
    assert float(ndcg_at_k(labels, labels, k=4)) == pytest.approx(1.0)
    scores = -labels
    val = float(ndcg_at_k(scores, labels, k=4))
    assert 0 < val < 1


def test_ndcg_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    scores = rng.random((8, 12))
    labels = rng.random((8, 12))
    ours = float(ndcg_at_k(jnp.asarray(scores), jnp.asarray(labels), k=10))
    ref = sklearn.ndcg_score(labels, scores, k=10)
    assert ours == pytest.approx(ref, abs=1e-6)


def test_binary_accuracy():
    acc = binary_accuracy(jnp.array([1.0, -1.0]), jnp.array([-1.0, 1.0]))
    assert float(acc) == 0.5


def test_mrr_sum_count_composes_to_mrr():
    import jax.numpy as jnp
    from tgm_tpu.eval.metrics import mrr, mrr_sum_count

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=12).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(12, 7)).astype(np.float32))
    s1, c1 = mrr_sum_count(pos[:5], neg[:5])
    s2, c2 = mrr_sum_count(pos[5:], neg[5:])
    combined = (float(s1) + float(s2)) / (float(c1) + float(c2))
    np.testing.assert_allclose(combined, float(mrr(pos, neg)), rtol=1e-6)


def test_mrr_all_invalid_batch_counts_zero():
    import jax.numpy as jnp
    from tgm_tpu.eval.metrics import mrr_sum_count

    pos = jnp.zeros(4)
    neg = jnp.zeros((4, 3))
    s, c = mrr_sum_count(pos, neg, edge_valid=jnp.zeros(4, bool))
    assert float(c) == 0.0
    assert float(s) == 0.0


def test_mrr_neg_valid_partial_candidates():
    """Masked-out candidates must not affect the rank."""
    import jax.numpy as jnp
    from tgm_tpu.eval.metrics import mrr_per_edge

    pos = jnp.asarray([1.0])
    neg = jnp.asarray([[2.0, 0.5, 9.0]])
    # With all candidates: 2 above pos -> rank 3.
    full = mrr_per_edge(pos, neg)
    np.testing.assert_allclose(np.asarray(full), [1 / 3])
    # Masking the two high candidates leaves rank 1.
    masked = mrr_per_edge(pos, neg, neg_valid=jnp.asarray([[False, True, False]]))
    np.testing.assert_allclose(np.asarray(masked), [1.0])


def test_mse_masks_invalid_rows():
    import jax.numpy as jnp
    from tgm_tpu.eval.metrics import mse

    pred = jnp.asarray([1.0, 2.0, 100.0])
    tgt = jnp.asarray([1.0, 0.0, 0.0])
    out = mse(pred, tgt, valid=jnp.asarray([True, True, False]))
    np.testing.assert_allclose(float(out), 2.0)  # mean((0, 4)) over valid


def test_ndcg_with_ties_and_mask():
    import jax.numpy as jnp
    from tgm_tpu.eval.metrics import ndcg_at_k

    scores = jnp.asarray([[0.9, 0.9, 0.1, 0.5]])
    labels = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    out = float(ndcg_at_k(scores, labels, k=4))
    assert 0.0 < out <= 1.0
