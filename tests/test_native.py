import numpy as np
import pytest

from tgm_tpu import native


def test_native_builds():
    assert native.native_available(), "C++ host ops failed to build"


def test_stable_sort_perm_matches_numpy():
    rng = np.random.default_rng(0)
    # Force the native path: above the size threshold, heavy duplicates.
    keys = rng.integers(0, 1000, 200_000).astype(np.int64)
    got = native.stable_sort_perm(keys)
    want = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got, want)


def test_stable_sort_perm_small_falls_back():
    keys = np.array([3, 1, 2, 1], dtype=np.int64)
    np.testing.assert_array_equal(native.stable_sort_perm(keys), [1, 3, 2, 0])


def test_lexsort2_matches_numpy():
    rng = np.random.default_rng(1)
    primary = rng.integers(0, 500, 200_000).astype(np.int64)
    secondary = rng.integers(0, 500, 200_000).astype(np.int64)
    got = native.lexsort2_perm(primary, secondary)
    want = np.lexsort((secondary, primary))
    np.testing.assert_array_equal(got, want)


def test_searchsorted_matches_numpy():
    rng = np.random.default_rng(2)
    arr = np.sort(rng.integers(0, 10_000, 50_000)).astype(np.int64)
    q = rng.integers(-10, 10_010, 5_000).astype(np.int64)
    for side in ("left", "right"):
        got = native.searchsorted(arr, q, side=side)
        np.testing.assert_array_equal(got, np.searchsorted(arr, q, side=side))


def test_big_keys():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**62, 100_000).astype(np.int64)
    got = native.stable_sort_perm(keys)
    np.testing.assert_array_equal(got, np.argsort(keys, kind="stable"))
