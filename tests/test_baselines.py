import numpy as np
import pytest

from tgm_tpu.nn import PopTrackPredictor, tCoMemPredictor


def test_poptrack_popularity():
    src = np.array([0, 1, 2, 3])
    dst = np.array([5, 5, 5, 6])
    ts = np.array([1, 2, 3, 4])
    p = PopTrackPredictor(src, dst, ts, num_nodes=10, k=5, decay=1.0)
    scores = p(np.array([0, 0]), np.array([5, 6]))
    assert scores[0] == 3.0 and scores[1] == 1.0
    # decay shrinks older popularity
    p2 = PopTrackPredictor(src, dst, ts, num_nodes=10, k=5, decay=0.5)
    s2 = p2(np.array([0]), np.array([5]))
    assert s2[0] == pytest.approx(1.5)  # (3 * 0.5)


def test_poptrack_update_decays_each_call():
    p = PopTrackPredictor(np.array([0]), np.array([1]), np.array([1]), num_nodes=4, k=2, decay=0.5)
    assert p(np.array([0]), np.array([1]))[0] == pytest.approx(0.5)
    p.update(np.array([0]), np.array([2]), np.array([2]))
    assert p(np.array([0]), np.array([1]))[0] == pytest.approx(0.25)
    assert p(np.array([0]), np.array([2]))[0] == pytest.approx(0.5)


def test_poptrack_validation():
    with pytest.raises(ValueError):
        PopTrackPredictor(np.array([0]), np.array([1]), np.array([1]), num_nodes=10, k=0)
    with pytest.raises(ValueError):
        PopTrackPredictor(np.array([0]), np.array([1]), np.array([1]), num_nodes=10, decay=0)
    with pytest.raises(ValueError):
        PopTrackPredictor(np.array([0]), np.array([1]), np.array([1]), num_nodes=2, k=5)


def test_tcomem_scores():
    src = np.array([0, 0, 1])
    dst = np.array([1, 2, 2])
    ts = np.array([10, 20, 30])
    m = tCoMemPredictor(src, dst, ts, num_nodes=5, k=4, window_ratio=1.0)
    scores = m(np.array([0, 0, 3]), np.array([1, 4, 4]))
    # (0,1) has co-occurrence 1 -> gets 0.8 * 0.5 on top of base
    assert scores[0] > scores[1]
    # node 3 never seen -> no recent nbrs, no co-occ
    assert scores[2] == 0.0


def test_tcomem_ring_buffer_eviction():
    src = np.zeros(6, dtype=np.int64)
    dst = np.arange(1, 7)
    ts = np.arange(1, 7)
    m = tCoMemPredictor(src[:1], dst[:1], ts[:1], num_nodes=10, k=3, window_ratio=1.0)
    m.update(src[1:], dst[1:], ts[1:])
    kept = set(m.recent_dst[0][m.recent_dst[0] >= 0].tolist())
    assert kept == {4, 5, 6}  # only the 3 most recent
    assert m.recent_pos[0] == 6 % 3


def test_tcomem_validation():
    a = np.array([0]); b = np.array([1]); t = np.array([1])
    with pytest.raises(ValueError):
        tCoMemPredictor(a, b, t, num_nodes=10, window_ratio=0)
    with pytest.raises(ValueError):
        tCoMemPredictor(a, b, t, num_nodes=10, co_occurrence_weight=2.0)
    with pytest.raises(ValueError):
        tCoMemPredictor(a, b, t, num_nodes=10, k=0)
