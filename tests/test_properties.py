"""Property-based tests (hypothesis) for the sketch algebra: merge laws,
serde round-trips, and error-bound invariants that must hold for ANY input,
not just the fixtures."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datasketches_spark_spark.sketches import (
    FreqItemsSketch,
    HllSketch,
    KllSketch,
    ReqSketch,
    ThetaSketch,
    deserialize_any,
)
from datasketches_spark_spark.sketches.theta import hash_longs

floats = st.lists(
    st.floats(min_value=-float(2**30), max_value=float(2**30),
              allow_nan=False, width=32),
    min_size=1, max_size=400)


class TestQuantileProperties:
    @given(vals=floats, splits=st.integers(1, 7))
    @settings(max_examples=60, deadline=None)
    def test_merge_of_chunks_preserves_weight_and_bounds(self, vals, splits):
        arr = np.asarray(vals, dtype=np.float32)
        for cls, kw in ((KllSketch, {"k": 32, "dtype": np.float32}),
                        (ReqSketch, {"k": 8})):
            parts = []
            for chunk in np.array_split(arr, splits):
                sk = cls(**kw)
                sk.update_batch(chunk.astype(np.float64))
                parts.append(sk)
            merged = parts[0]
            for p in parts[1:]:
                merged = merged.merge(p)
            assert merged.n == arr.size
            v, w = merged._weighted_items()
            assert int(w.sum()) == arr.size          # weight conservation
            q = merged.quantile(0.5)
            assert arr.min() <= q <= arr.max()       # estimates stay in range
            assert merged.quantile(0.0) == float(arr.min())

    @given(vals=floats)
    @settings(max_examples=40, deadline=None)
    def test_serde_roundtrip_identical_quantiles(self, vals):
        for cls, kw in ((KllSketch, {"k": 16, "dtype": np.float32}),
                        (ReqSketch, {"k": 8})):
            sk = cls(**kw)
            sk.update_batch(np.asarray(vals, dtype=np.float64))
            back = deserialize_any(sk.serialize())
            assert type(back) is cls
            for p in (0.0, 0.25, 0.5, 0.9, 1.0):
                assert back.quantile(p) == sk.quantile(p)

    @given(vals=floats)
    @settings(max_examples=40, deadline=None)
    def test_req_max_always_exact(self, vals):
        sk = ReqSketch(k=4)
        sk.update_batch(np.asarray(vals, dtype=np.float64))
        assert sk.quantile(1.0) == float(np.asarray(vals,
                                                    dtype=np.float32).max())


class TestThetaProperties:
    @given(vals=st.lists(st.integers(-2**62, 2**62), min_size=1,
                         max_size=300), splits=st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_exact_below_k_and_merge_commutative(self, vals, splits):
        arr = np.asarray(vals, dtype=np.int64)
        nd = len(np.unique(arr))
        parts = []
        for chunk in np.array_split(arr, splits):
            sk = ThetaSketch(k=1024)
            if chunk.size:
                sk.update_hashes(hash_longs(chunk))
            parts.append(sk)
        ab = parts[0]
        for p in parts[1:]:
            ab = ab.merge(p)
        assert ab.estimate() == nd  # exact regime: k > distinct count
        back = deserialize_any(ab.serialize())
        assert back.estimate() == nd


class TestFreqProperties:
    @given(items=st.lists(st.sampled_from("abcdefghij"), min_size=1,
                          max_size=500), cap=st.sampled_from([4, 8, 16]))
    @settings(max_examples=60, deadline=None)
    def test_estimate_brackets_true_count(self, items, cap):
        from collections import Counter
        sk = FreqItemsSketch(max_map_size=cap)
        sk.update_batch(items)
        true = Counter(items)
        for item, c in true.items():
            est = sk.estimate(item)
            # Misra-Gries bound: true - max_err <= lower <= true,
            # estimate (count+err) >= true
            if est:
                assert est >= c - sk._max_err
            assert sk.estimate(item) <= c + sk._max_err * 2

    @given(items=st.lists(st.sampled_from("abcde"), min_size=1, max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_serde_roundtrip(self, items):
        sk = FreqItemsSketch(max_map_size=8)
        sk.update_batch(items)
        back = deserialize_any(sk.serialize())
        for item in "abcde":
            assert back.estimate(item) == sk.estimate(item)


class TestHllProperties:
    @given(vals=st.lists(st.integers(0, 2**62), min_size=1, max_size=500),
           splits=st.integers(1, 5))
    @settings(max_examples=40, deadline=None)
    def test_merge_register_identity(self, vals, splits):
        arr = np.asarray(vals, dtype=np.int64)
        whole = HllSketch(lgk=12)
        whole.update_hashes(hash_longs(arr))
        merged = HllSketch(lgk=12)
        for chunk in np.array_split(arr, splits):
            part = HllSketch(lgk=12)
            if chunk.size:
                part.update_hashes(hash_longs(chunk))
            merged.merge(part)
        assert (merged.registers() == whole.registers()).all()
        assert deserialize_any(merged.serialize()).estimate() == whole.estimate()


class TestReservoirProperties:
    @given(vals=floats, splits=st.integers(1, 7), k=st.integers(1, 64))
    @settings(max_examples=60, deadline=None)
    def test_merge_of_chunks_preserves_n_and_subset(self, vals, splits, k):
        from datasketches_spark_spark.sketches import ReservoirSketch
        arr = np.asarray(vals, dtype=np.float64)
        chunks = np.array_split(arr, splits)
        merged = None
        for c in chunks:
            sk = ReservoirSketch(k=k)
            sk.update_batch(c)
            sk = deserialize_any(sk.serialize())  # states, like Spark would
            merged = sk if merged is None else merged.merge(sk)
        assert merged.n == arr.size
        items = merged.items()
        assert len(items) == min(arr.size, k)
        # every retained item came from the stream (multiset containment)
        from collections import Counter
        assert not Counter(items) - Counter(arr.tolist())
        if arr.size <= k:  # exact regime: identity regardless of split
            assert items == sorted(arr.tolist())

    @given(vals=floats, splits=st.integers(1, 7), k=st.integers(1, 64))
    @settings(max_examples=60, deadline=None)
    def test_weighted_merge_deterministic_any_tree(self, vals, splits, k):
        from datasketches_spark_spark.sketches import WeightedReservoirSketch
        arr = np.asarray(vals, dtype=np.float64)
        w = np.abs(arr) + 1.0
        chunks = np.array_split(np.arange(arr.size), splits)
        states = []
        for i, idx in enumerate(chunks):
            sk = WeightedReservoirSketch(k=k)
            sk.update_batch(arr[idx], w[idx])
            states.append(sk.serialize())
        # left fold vs right fold must agree item-for-item (strict monoid)
        def fold(seq):
            m = None
            for s in seq:
                sk = deserialize_any(s)
                m = sk if m is None else m.merge(sk)
            return m
        lf, rf = fold(states), fold(list(reversed(states)))
        assert lf.items() == rf.items()
        assert lf.n == rf.n == arr.size
        # float summation is non-associative: equal to the last few ulps only
        assert lf.total_weight == pytest.approx(rf.total_weight, rel=1e-12)
        if arr.size <= k:
            assert lf.items() == sorted(arr.tolist())


class TestMurmur3Vectorized:
    def test_batch_matches_scalar(self):
        """hash128_bytes must equal hash128 item-by-item for arbitrary
        byte strings (length groups exercise block and tail paths)."""
        import numpy as np
        from hypothesis import given, settings, strategies as st
        from datasketches_spark_spark.sketches.murmur3 import (
            hash128, hash128_bytes)

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.binary(min_size=1, max_size=40),
                        min_size=1, max_size=30))
        def check(items):
            h1, h2 = hash128_bytes(items)
            for k, b in enumerate(items):
                assert (int(h1[k]), int(h2[k])) == hash128(b)

        check()


class TestTupleProperties:
    @given(pairs=st.lists(st.tuples(st.integers(0, 400),
                                    st.integers(-1000, 1000)),
                          min_size=1, max_size=400),
           splits=st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_exact_below_k_merge_split_invariant(self, pairs, splits):
        """For ANY (key, value) multiset below k: NDV/rows/sum/segment
        are exact, independent of how the stream is split and merged,
        and survive serde."""
        from datasketches_spark_spark.sketches import TupleSketch
        keys = np.asarray([p[0] for p in pairs], dtype=np.int64)
        vals = np.asarray([p[1] for p in pairs], dtype=np.float64)
        parts = []
        for idx in np.array_split(np.arange(len(keys)), splits):
            sk = TupleSketch(k=1024)
            if idx.size:
                sk.update_batch(hash_longs(keys[idx]), vals[idx])
            parts.append(sk)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.merge(p)
        uniq, counts = np.unique(keys, return_counts=True)
        sums = np.zeros(len(uniq))
        np.add.at(sums, np.searchsorted(uniq, keys), vals)
        assert merged.estimate() == len(uniq)
        assert merged.rows_estimate() == len(keys)
        assert merged.sum_estimate() == pytest.approx(float(vals.sum()))
        m = counts >= 2
        back = deserialize_any(merged.serialize())
        got_keys, got_sum = back.segment_estimate(2)
        assert got_keys == int(m.sum())
        assert got_sum == pytest.approx(float(sums[m].sum()))

    @given(n=st.integers(5_000, 40_000), k=st.sampled_from([256, 1024]))
    @settings(max_examples=10, deadline=None)
    def test_saturated_segment_consistency(self, n, k):
        """At saturation: segment(1) == (estimate, sum_estimate) by
        construction (one shared HT sample), and the NDV estimate stays
        inside a 6-sigma KMV envelope."""
        from datasketches_spark_spark.sketches import TupleSketch
        sk = TupleSketch(k=k)
        sk.update_batch(hash_longs(np.arange(n, dtype=np.int64)),
                        np.ones(n))
        assert not sk.is_exact()
        keys, total = sk.segment_estimate(1)
        assert keys == sk.estimate()
        assert total == pytest.approx(sk.sum_estimate())
        rse = 1.0 / np.sqrt(k - 2)
        assert abs(sk.estimate() - n) / n < 6 * rse
