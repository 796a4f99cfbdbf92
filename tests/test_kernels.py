"""Differential tests of the numpy set kernels against brute-force oracles.

Mirrors the reference's differential test harness
(``src/exp/test_intersection_algos.cpp:102-127`` — every SIMD variant is
checked element-wise against the scalar merge oracle on parameterized random
sorted sets from ``src/exp/random_data_generator.cpp:4-45``).
"""

import numpy as np
import pytest

from graphsetintersection_spark import kernels as K


def gen_sorted_pair(rng, length, skew, selectivity, density):
    """Two sorted unique sets with controlled size skew and overlap —
    the same parameter space as the reference's gen_id_list
    (src/exp/random_data_generator.cpp: -len/-skew/-select/-dense)."""
    size_a = max(1, int(length))
    size_b = max(1, int(length * skew))
    universe = max(size_a, size_b) / max(density, 1e-9)
    a = np.unique(rng.integers(0, int(universe), size_a))
    n_common = int(selectivity * min(size_a, size_b))
    common = rng.choice(a, size=min(n_common, len(a)), replace=False)
    b_rand = rng.integers(0, int(universe), size_b)
    b = np.unique(np.concatenate([common, b_rand]))
    return np.sort(a).astype(np.int64), np.sort(b).astype(np.int64)


GRID = [
    (length, skew, select, dense)
    for length in (0, 1, 10, 1000)
    for skew in (1.0, 0.1)
    for select in (0.0, 0.5, 1.0)
    for dense in (0.01, 0.5)
]


@pytest.mark.parametrize("length,skew,select,dense", GRID)
def test_pairwise_contracts(length, skew, select, dense):
    rng = np.random.default_rng(42)
    a, b = gen_sorted_pair(rng, length, skew, select, dense)
    oracle = np.intersect1d(a, b)
    assert np.array_equal(K.intersect(a, b), oracle)
    assert K.intersect_count(a, b) == len(oracle)
    assert np.array_equal(K.union(a, b), np.union1d(a, b))
    assert np.array_equal(K.difference(a, b), np.setdiff1d(a, b))


@pytest.mark.parametrize("length,skew,select,dense", GRID)
def test_bsr_roundtrip_and_intersect(length, skew, select, dense):
    rng = np.random.default_rng(7)
    a, b = gen_sorted_pair(rng, length, skew, select, dense)
    ba, sa = K.to_bsr(a)
    bb, sb = K.to_bsr(b)
    assert np.array_equal(K.from_bsr(ba, sa), a)
    assert np.array_equal(K.from_bsr(bb, sb), b)
    oracle = np.intersect1d(a, b)
    assert K.bsr_intersect_count(ba, sa, bb, sb) == len(oracle)
    rb, rs = K.bsr_intersect(ba, sa, bb, sb)
    assert np.array_equal(K.from_bsr(rb, rs), oracle)


def test_bsr_merge_one():
    rng = np.random.default_rng(5)
    a = np.unique(rng.integers(0, 500, 60)).astype(np.int64)
    ba, sa = K.to_bsr(a)
    for v in (0, 63, 64, 499, 257):
        nb, ns = K.bsr_merge_one(ba, sa, int(v))
        assert np.array_equal(
            K.from_bsr(nb, ns), np.union1d(a, [v])
        ), f"merge_one failed for {v}"
    # idempotent on existing member
    v0 = int(a[0])
    nb, ns = K.bsr_merge_one(ba, sa, v0)
    assert np.array_equal(K.from_bsr(nb, ns), a)


def test_visited_bitmap_ops():
    visited = np.zeros(100, dtype=bool)
    visited[[2, 3, 50]] = True
    a = np.array([1, 2, 3, 10, 50, 99], dtype=np.int64)
    assert np.array_equal(K.subtract_visited(a, visited), [1, 10, 99])
    assert np.array_equal(K.keep_visited(a, visited), [2, 3, 50])


def test_batch_intersect_count_matches_rowwise():
    rng = np.random.default_rng(123)
    lists_a, lists_b, expected = [], [], []
    for i in range(200):
        a, b = gen_sorted_pair(
            rng, rng.integers(0, 50), 1.0, float(rng.random()), 0.3
        )
        lists_a.append(a)
        lists_b.append(b)
        expected.append(len(np.intersect1d(a, b)))
    got = K.batch_intersect_count_lists(lists_a, lists_b)
    assert got.tolist() == expected


def test_batch_intersect_count_empty_rows():
    e = np.empty(0, dtype=np.int64)
    got = K.batch_intersect_count_lists([e, np.array([1, 2])], [np.array([1]), e])
    assert got.tolist() == [0, 0]
    assert K.batch_intersect_count_lists([], []).tolist() == []


def _flatten_lists(lists):
    lens = np.array([len(x) for x in lists], dtype=np.int64)
    vals = (
        np.concatenate([np.asarray(x, dtype=np.int64) for x in lists])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    return vals, lens


@pytest.mark.parametrize("dense", [0.01, 0.3, 0.9])
def test_batch_bsr_matches_uint_kernel(dense):
    """BSR batch kernel ≡ element-wise batch kernel across densities
    (the reference's BP-vs-Org parity, src/tc.cpp:14-16)."""
    rng = np.random.default_rng(31)
    lists_a, lists_b = [], []
    for _ in range(150):
        a, b = gen_sorted_pair(
            rng, rng.integers(0, 80), 1.0, float(rng.random()), dense
        )
        lists_a.append(a)
        lists_b.append(b)
    va, la = _flatten_lists(lists_a)
    vb, lb = _flatten_lists(lists_b)
    got_bsr = K.batch_bsr_intersect_count(va, la, vb, lb)
    got_uint = K.batch_intersect_count(va, la, vb, lb)
    assert got_bsr.tolist() == got_uint.tolist()


def test_batch_bsr_empty():
    e = np.empty(0, dtype=np.int64)
    z = np.array([0], dtype=np.int64)
    assert K.batch_bsr_intersect_count(e, z, e, z).tolist() == [0]
    assert K.batch_bsr_intersect_count(
        e, np.empty(0, dtype=np.int64), e, np.empty(0, dtype=np.int64)
    ).tolist() == []


def test_batch_kernels_reject_out_of_range_ids():
    big = np.array([1 << 40], dtype=np.int64)
    one = np.array([1], dtype=np.int64)
    for fn in (K.batch_intersect_count, K.batch_bsr_intersect_count):
        with pytest.raises(ValueError):
            fn(big, one, big, one)
        with pytest.raises(ValueError):
            fn(-one, one, one, one)


def test_batch_union_difference_match_rowwise():
    """Batch forms of contracts 2-3 vs per-row numpy oracles."""
    rng = np.random.default_rng(7)
    lists_a, lists_b = [], []
    for i in range(40):
        a = np.unique(rng.integers(0, 500, size=rng.integers(0, 60)))
        b = np.unique(rng.integers(0, 500, size=rng.integers(0, 60)))
        lists_a.append(a.astype(np.int64))
        lists_b.append(b.astype(np.int64))
    va, la = K._flatten(lists_a)
    vb, lb = K._flatten(lists_b)

    uv, ul = K.batch_union(va, la, vb, lb)
    off = np.concatenate([[0], np.cumsum(ul)])
    for i, (a, b) in enumerate(zip(lists_a, lists_b)):
        got = uv[off[i]:off[i + 1]]
        assert np.array_equal(got, np.union1d(a, b)), i

    dv, dl = K.batch_difference(va, la, vb, lb)
    off = np.concatenate([[0], np.cumsum(dl)])
    for i, (a, b) in enumerate(zip(lists_a, lists_b)):
        got = dv[off[i]:off[i + 1]]
        assert np.array_equal(got, np.setdiff1d(a, b, assume_unique=True)), i


def test_batch_union_difference_empty():
    e = np.empty(0, dtype=np.int64)
    uv, ul = K.batch_union(e, e, e, e)
    assert len(uv) == 0 and len(ul) == 0
    va, la = K._flatten([np.array([1, 2], dtype=np.int64)])
    uv, ul = K.batch_union(va, la, e, np.array([0], dtype=np.int64))
    assert list(uv) == [1, 2] and list(ul) == [2]
    dv, dl = K.batch_difference(va, la, e, np.array([0], dtype=np.int64))
    assert list(dv) == [1, 2] and list(dl) == [2]
