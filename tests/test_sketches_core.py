"""Unit tests for the pure-Python sketch core (no Spark).

Mirrors the reference's SketchExpressionSuite strategy
(``SketchExpressionSuite.scala:27-85``): exercise serialize -> deserialize ->
merge -> estimate round trips and exactness/accuracy properties.
"""

import numpy as np
import pytest

from datasketches_spark_spark.sketches import (
    FreqItemsSketch,
    KllSketch,
    ThetaSketch,
    deserialize_any,
)


# --------------------------------------------------------------------- KLL

class TestKll:
    def test_exact_small(self):
        sk = KllSketch(k=200)
        sk.update_batch(np.arange(1, 101, dtype=np.float64))
        assert sk.is_exact()
        # rank rule: smallest value with cumweight >= ceil(p*n)
        assert sk.quantile(0.5) == 50.0
        assert sk.quantile(0.95) == 95.0
        assert sk.quantile(0.0) == 1.0
        assert sk.quantile(1.0) == 100.0

    def test_empty_returns_none(self):
        sk = KllSketch()
        assert sk.quantile(0.5) is None
        assert sk.quantiles([0.1, 0.9]) is None
        assert sk.pmf(4) is None

    def test_update_weighted_matches_repeat(self):
        # (value, count) feed == count repeated raw updates on every
        # surface the engine queries read (rank/cdf/quantile/pmf/serde),
        # the q35 pre-aggregate contract.
        rng = np.random.default_rng(7)
        vals = rng.permutation(np.arange(1.0, 51.0))
        cnts = rng.integers(1, 5000, size=vals.size)
        w = KllSketch(k=262_144, dtype=np.float64)
        w.update_weighted(vals, cnts)
        r = KllSketch(k=262_144, dtype=np.float64)
        r.update_batch(np.repeat(vals, cnts))
        assert w.n == r.n == int(cnts.sum())
        assert (w.min_value, w.max_value) == (r.min_value, r.max_value)
        ps = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
        assert w.quantiles(ps) == r.quantiles(ps)
        for x in (0.5, 10.0, 25.0, 25.5, 50.0, 99.0):
            assert w.rank(x) == r.rank(x)
            assert w.cdf([x]) == r.cdf([x])
        assert w.pmf(9) == r.pmf(9)
        # survives serde and merge with a raw-update sketch
        back = deserialize_any(w.serialize())
        assert back.quantiles(ps) == r.quantiles(ps)
        extra = np.array([3.0, 3.0, 60.0])
        m1 = deserialize_any(w.serialize())
        m2 = KllSketch(k=262_144, dtype=np.float64)
        m2.update_batch(extra)
        m1.merge(m2)
        r.update_batch(extra)
        assert m1.n == r.n
        assert m1.quantiles(ps) == r.quantiles(ps)
        # weighted update drops nulls/non-positive counts like the
        # unweighted path drops NaN values
        z = KllSketch(k=128, dtype=np.float64)
        z.update_weighted(np.array([1.0, np.nan, 2.0]),
                          np.array([0, 5, 3]))
        assert z.n == 3 and z.quantile(1.0) == 2.0

    def test_serde_roundtrip(self):
        sk = KllSketch(k=128)
        sk.update_batch(np.random.default_rng(1).normal(size=5000))
        blob = sk.serialize()
        sk2 = KllSketch.deserialize(blob)
        assert sk2.n == sk.n
        assert sk2.quantile(0.5) == sk.quantile(0.5)
        assert isinstance(deserialize_any(blob), KllSketch)

    def test_merge_matches_union(self):
        rng = np.random.default_rng(2)
        a, b = rng.normal(size=20000), rng.normal(size=30000)
        sa, sb = KllSketch(k=200), KllSketch(k=200)
        sa.update_batch(a)
        sb.update_batch(b)
        sa.merge(sb)
        assert sa.n == 50000
        exact = np.quantile(np.concatenate([a, b]), 0.5)
        assert abs(sa.quantile(0.5) - exact) < 0.05

    def test_accuracy_large(self):
        rng = np.random.default_rng(3)
        data = rng.uniform(0, 1, size=200_000)
        sk = KllSketch(k=200)
        for chunk in np.array_split(data, 37):
            sk.update_batch(chunk)
        assert not sk.is_exact()
        for p in [0.01, 0.25, 0.5, 0.75, 0.99]:
            est = sk.quantile(p)
            # rank error for k=200 should be well under 2%
            true_rank = (data <= est).mean()
            assert abs(true_rank - max(p, 1e-9)) < 0.02, (p, est, true_rank)

    def test_pmf_exact(self):
        sk = KllSketch(k=1000, dtype=np.float64)
        vals = np.arange(1.0, 101.0)
        sk.update_batch(vals)
        pmf = sk.pmf(4)
        assert len(pmf) == 4
        assert abs(sum(pmf) - 1.0) < 1e-12
        # splits at 1+i*99/4 = 25.75, 50.5, 75.25 over integers 1..100
        assert pmf[0] == 25 / 100  # x < 25.75
        assert pmf[1] == 25 / 100  # 25.75 <= x < 50.5
        assert pmf[2] == 25 / 100
        assert pmf[3] == 25 / 100

    def test_float32_downcast(self):
        # reference parity: values sketched as float32 (quantileSketches.scala:250-255)
        sk = KllSketch(k=100, dtype=np.float32)
        sk.update_batch(np.asarray([1.1, 2.2, 3.3]))
        q = sk.quantile(0.5)
        assert q == pytest.approx(np.float32(2.2), abs=0)

    def test_quantile_disc_rule_matches_duckdb(self):
        import duckdb
        rng = np.random.default_rng(4)
        vals = rng.integers(0, 1000, size=777).astype(np.float64)
        sk = KllSketch(k=4096, dtype=np.float64)
        sk.update_batch(vals)
        assert sk.is_exact()
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest($1::DOUBLE[]) v", [list(vals)])
        for p in [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0]:
            want = con.execute(f"SELECT quantile_disc(v, {p}) FROM t").fetchone()[0]
            assert sk.quantile(p) == want, p


# --------------------------------------------------------------------- freq

class TestFreq:
    def test_exact_regime(self):
        sk = FreqItemsSketch(max_map_size=64)
        sk.update_batch(["a"] * 3 + ["b"] + ["c"])
        assert sk.is_exact()
        assert sk.frequent_items() == [("a", 3), ("b", 1), ("c", 1)]

    def test_long_items(self):
        from datasketches_spark_spark.sketches import ITEM_LONG
        sk = FreqItemsSketch(max_map_size=64, item_type=ITEM_LONG)
        sk.update_batch([7, 7, 8])
        assert sk.frequent_items() == [(7, 2), (8, 1)]

    def test_serde_roundtrip(self):
        sk = FreqItemsSketch(max_map_size=64)
        sk.update_batch(["x", "y", "x"])
        sk2 = FreqItemsSketch.deserialize(sk.serialize())
        assert sk2.frequent_items() == sk.frequent_items()
        assert sk2.n == 3

    def test_merge(self):
        a = FreqItemsSketch(max_map_size=64)
        b = FreqItemsSketch(max_map_size=64)
        a.update_batch(["a", "a", "b"])
        b.update_batch(["a", "c"])
        a.merge(b)
        assert a.frequent_items() == [("a", 3), ("b", 1), ("c", 1)]
        assert a.n == 5

    def test_no_false_positives_under_purge(self):
        rng = np.random.default_rng(5)
        # heavy item appears 5000 times among 20000 noise items
        stream = ["HEAVY"] * 5000 + [f"n{i}" for i in rng.integers(0, 20000, 20000)]
        rng.shuffle(stream)
        sk = FreqItemsSketch(max_map_size=256)
        for i in range(0, len(stream), 1000):
            sk.update_batch(stream[i:i + 1000])
        assert not sk.is_exact()
        items = dict(sk.frequent_items())
        assert "HEAVY" in items
        # estimate is an upper bound within n/cap of truth
        assert items["HEAVY"] >= 5000
        assert items["HEAVY"] - 5000 <= len(stream) // 256 + 1

    def test_invalid_map_size(self):
        with pytest.raises(ValueError):
            FreqItemsSketch(max_map_size=100)  # not a power of 2


# --------------------------------------------------------------------- theta

class TestTheta:
    def test_exact_below_k(self):
        sk = ThetaSketch(k=4096)
        sk.update_longs(np.arange(1000))
        assert sk.is_exact()
        assert sk.estimate() == 1000

    def test_string_updates(self):
        sk = ThetaSketch(k=4096)
        sk.update_strings([f"u{i}" for i in range(500)] * 3)
        assert sk.estimate() == 500

    def test_estimation_accuracy(self):
        sk = ThetaSketch(k=4096)
        n = 1_000_000
        sk.update_longs(np.arange(n))
        assert not sk.is_exact()
        est = sk.estimate()
        assert abs(est - n) / n < 0.05  # ~3 RSE at k=4096

    def test_merge_dedups(self):
        a, b = ThetaSketch(k=1024), ThetaSketch(k=1024)
        a.update_longs(np.arange(0, 600))
        b.update_longs(np.arange(300, 900))
        a.merge(b)
        assert a.estimate() == 900  # still exact: 900 < k

    def test_serde_roundtrip(self):
        sk = ThetaSketch(k=256)
        sk.update_longs(np.arange(10_000))
        sk2 = ThetaSketch.deserialize(sk.serialize())
        assert sk2.estimate() == sk.estimate()
        assert isinstance(deserialize_any(sk.serialize()), ThetaSketch)


class TestHashing:
    def test_float_distinctness_preserved(self):
        # round-1 bug: astype(int64) collapsed 1.5 and 1.7 (ADVICE item)
        import numpy as np
        from datasketches_spark_spark.sketches import ThetaSketch, hash_doubles
        sk = ThetaSketch(k=64)
        sk.update_hashes(hash_doubles(np.array([1.5, 1.7, 1.5])))
        assert sk.estimate() == 2

    def test_integral_float_matches_int(self):
        # int column arriving as float64 (nulls) must merge consistently
        # with partitions that arrived as int64
        import numpy as np
        from datasketches_spark_spark.sketches import hash_doubles, hash_longs
        ints = np.array([0, 1, 5, -3, 2**40], dtype=np.int64)
        assert (hash_doubles(ints.astype(np.float64)) == hash_longs(ints)).all()

    def test_negative_zero(self):
        import numpy as np
        from datasketches_spark_spark.sketches import hash_doubles
        a = hash_doubles(np.array([0.0]))
        b = hash_doubles(np.array([-0.0]))
        assert (a == b).all()

    def test_string_hash_stable_and_distinct(self):
        import numpy as np
        from datasketches_spark_spark.sketches import hash_strings
        vals = [f"item-{i}" for i in range(1000)]
        h1 = hash_strings(np.array(vals, dtype=object))
        h2 = hash_strings(np.array(vals, dtype=object))
        assert (h1 == h2).all()
        assert len(set(h1.tolist())) == 1000

    def test_hash_series_dispatch(self):
        import numpy as np
        import pandas as pd
        from datasketches_spark_spark.sketches import (
            hash_longs, hash_series, hash_strings)
        assert (hash_series(pd.Series([1, 2, 3]))
                == hash_longs(np.array([1, 2, 3]))).all()
        assert (hash_series(pd.Series(["a", "b"]))
                == hash_strings(np.array(["a", "b"], dtype=object))).all()


class TestFreqMergeSymmetry:
    def test_merge_order_independent_estimates(self):
        # ADVICE item: self-only items previously missed other's max_err,
        # so estimates depended on merge order after a lossy merge
        from datasketches_spark_spark.sketches import FreqItemsSketch

        def build(items):
            sk = FreqItemsSketch(max_map_size=4)
            sk.update_batch(items)
            return sk

        left = ["a"] * 100 + ["b"] * 50 + ["x", "y", "z", "w", "v"]  # purges
        right = ["a"] * 80 + ["c"] * 60 + ["p", "q", "r", "s", "t"]  # purges
        ab = build(left).merge(build(right))
        ba = build(right).merge(build(left))
        for item in ("a", "b", "c"):
            assert ab.estimate(item) == ba.estimate(item), item
        assert ab._max_err == ba._max_err

    def test_weighted_update(self):
        from datasketches_spark_spark.sketches import FreqItemsSketch
        sk = FreqItemsSketch(max_map_size=16)
        sk.update("a", weight=5)
        sk.update("a")
        sk.update("b", weight=0)
        assert sk.estimate("a") == 6
        assert sk.estimate("b") == 0
        assert sk.n == 6


class TestReqSketch:
    def test_exact_regime(self):
        import numpy as np
        from datasketches_spark_spark.sketches import ReqSketch
        sk = ReqSketch(k=64)  # capacity 6k=384 > 300
        vals = np.random.default_rng(1).permutation(300).astype(np.float64)
        sk.update_batch(vals)
        assert sk.is_exact()
        # rank rule: value at rank max(ceil(p*n),1) over 0..299
        assert sk.quantile(0.5) == 149.0
        assert sk.quantile(1.0) == 299.0
        assert sk.quantile(0.0) == 0.0

    def test_tail_accuracy_beats_kll(self):
        # REQ's reason to exist: relative error at the rank extremes
        # (quantileSketches.scala:387-405 wraps DataSketches ReqSketch)
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch, ReqSketch
        n = 200_000

        def rank_err(sk, p):
            target = max(int(np.ceil(p * n)), 1)
            return abs((sk.quantile(p) + 1) - target) / n

        for seed in (7, 11, 42):
            vals = np.random.default_rng(seed).permutation(n).astype(np.float64)
            req, kll = ReqSketch(k=12), KllSketch(k=260, dtype=np.float32)
            for chunk in np.array_split(vals, 50):
                req.update_batch(chunk)
                kll.update_batch(chunk)
            # max is exact: protected region is never compacted
            assert rank_err(req, 1.0) == 0.0
            assert rank_err(req, 0.999) <= 1e-4
            assert rank_err(req, 0.999) <= rank_err(kll, 0.999) + 1e-6

    def test_merge_weight_exact(self):
        import numpy as np
        from datasketches_spark_spark.sketches import ReqSketch
        n = 50_000
        vals = np.random.default_rng(3).permutation(n).astype(np.float64)
        parts = []
        for chunk in np.array_split(vals, 16):
            s = ReqSketch(k=12)
            s.update_batch(chunk)
            parts.append(s)
        m = parts[0]
        for s in parts[1:]:
            m = m.merge(s)
        assert m.n == n
        v, w = m._weighted_items()
        assert int(w.sum()) == n  # weight-exact compaction invariant
        assert m.quantile(1.0) == n - 1

    def test_serde_roundtrip(self):
        import numpy as np
        from datasketches_spark_spark.sketches import (
            ReqSketch, deserialize_any, deserialize_quantile)
        sk = ReqSketch(k=12)
        sk.update_batch(np.arange(10_000, dtype=np.float64))
        back = ReqSketch.deserialize(sk.serialize())
        assert back.n == sk.n
        assert back.quantile(0.99) == sk.quantile(0.99)
        assert isinstance(deserialize_any(sk.serialize()), ReqSketch)
        assert deserialize_quantile(sk.serialize()).quantile(1.0) == 9999.0

    def test_kll_req_states_do_not_merge(self):
        import numpy as np
        import pytest
        from datasketches_spark_spark.sketches import KllSketch, ReqSketch
        a = ReqSketch(k=12)
        b = KllSketch(k=200, dtype=np.float32)
        a.update_batch(np.arange(10, dtype=np.float64))
        b.update_batch(np.arange(10, dtype=np.float64))
        with pytest.raises(ValueError):
            a.merge(b)


class TestKllWeightExact:
    def test_cum_weight_equals_n_after_compaction(self):
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch
        sk = KllSketch(k=50, dtype=np.float32)
        n = 100_000
        sk.update_batch(np.random.default_rng(5).permutation(n).astype(np.float64))
        v, w = sk._weighted_items()
        assert int(w.sum()) == n


class TestHllSketch:
    def test_accuracy_within_rse_bounds(self):
        import numpy as np
        from datasketches_spark_spark.sketches import HllSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        for lgk, n in [(12, 100_000), (14, 1_000_000)]:
            rse = 1.04 / (2 ** (lgk / 2))
            errs = []
            for seed in (1, 2, 3):
                sk = HllSketch(lgk=lgk)
                vals = np.random.default_rng(seed).integers(
                    0, 2**62, size=n, dtype=np.int64)
                sk.update_hashes(hash_longs(vals))
                nd = len(np.unique(vals))
                errs.append(abs(sk.estimate() - nd) / nd)
            assert np.mean(errs) < 3 * rse, (lgk, errs)

    def test_merge_equals_single_stream(self):
        import numpy as np
        from datasketches_spark_spark.sketches import HllSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        vals = np.random.default_rng(9).integers(0, 2**62, size=200_000,
                                                 dtype=np.int64)
        whole = HllSketch(lgk=12)
        whole.update_hashes(hash_longs(vals))
        merged = HllSketch(lgk=12)
        for chunk in np.array_split(vals, 16):
            part = HllSketch(lgk=12)
            part.update_hashes(hash_longs(chunk))
            merged.merge(part)
        assert merged.estimate() == whole.estimate()  # registers identical

    def test_serde_and_lifecycle_dispatch(self):
        import numpy as np
        from datasketches_spark_spark.sketches import (
            HllSketch, deserialize_any)
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = HllSketch(lgk=12)
        sk.update_hashes(hash_longs(np.arange(50_000, dtype=np.int64)))
        back = deserialize_any(sk.serialize())
        assert isinstance(back, HllSketch)
        assert back.estimate() == sk.estimate()

    def test_lgk_mismatch_refuses_merge(self):
        import pytest
        from datasketches_spark_spark.sketches import HllSketch
        with pytest.raises(ValueError, match="lgk"):
            HllSketch(lgk=12).merge(HllSketch(lgk=13))

    def test_sparse_phase_exact_and_serde(self):
        import numpy as np
        from datasketches_spark_spark.sketches import (
            HllSketch, deserialize_any)
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = HllSketch(lgk=12)  # sparse cap = 2^9 = 512
        sk.update_hashes(hash_longs(np.arange(300, dtype=np.int64)))
        assert sk.is_sparse and sk.estimate() == 300
        back = deserialize_any(sk.serialize())
        assert back.is_sparse and back.estimate() == 300
        # duplicates do not advance the count
        sk.update_hashes(hash_longs(np.arange(300, dtype=np.int64)))
        assert sk.estimate() == 300

    def test_sparse_densifies_past_cap(self):
        import numpy as np
        from datasketches_spark_spark.sketches import HllSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = HllSketch(lgk=12)
        sk.update_hashes(hash_longs(np.arange(2_000, dtype=np.int64)))
        assert not sk.is_sparse
        assert abs(sk.estimate() - 2_000) / 2_000 < 0.05

    def test_merge_sparse_dense_mixes(self):
        import numpy as np
        from datasketches_spark_spark.sketches import HllSketch
        from datasketches_spark_spark.sketches.theta import hash_longs

        def mk(lo, hi):
            sk = HllSketch(lgk=12)
            sk.update_hashes(hash_longs(np.arange(lo, hi, dtype=np.int64)))
            return sk

        whole = mk(0, 5_000)
        # sparse + dense and dense + sparse both equal the single-stream sketch
        a = mk(0, 100).merge(mk(100, 5_000))
        b = mk(0, 4_000).merge(mk(4_000, 5_000))
        assert (a.registers() == whole.registers()).all()
        assert (b.registers() == whole.registers()).all()
        # sparse+sparse staying under cap is exact
        s = mk(0, 200).merge(mk(100, 400))
        assert s.is_sparse and s.estimate() == 400
        # sparse+sparse overflowing the cap densifies and matches whole
        t = mk(0, 400).merge(mk(300, 5_000))
        assert not t.is_sparse
        assert (t.registers() == whole.registers()).all()

    def test_small_range_linear_counting(self):
        import numpy as np
        from datasketches_spark_spark.sketches import HllSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = HllSketch(lgk=12)
        sk.update_hashes(hash_longs(np.arange(100, dtype=np.int64)))
        assert abs(sk.estimate() - 100) <= 3

    def test_legacy_v1_dense_state_still_decodes(self):
        """Round-2 HLL states (serde v1, payload = lgk + registers, no
        mode byte) must keep deserializing after the sparse-phase layout
        change — ADVICE r3: the mode byte landed without a version bump."""
        import struct
        import numpy as np
        from datasketches_spark_spark.sketches import HllSketch
        from datasketches_spark_spark.sketches.serde import MAGIC, FAMILY_HLL
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = HllSketch(lgk=12)
        sk.update_hashes(hash_longs(np.arange(50_000, dtype=np.int64)))
        regs = sk.registers()
        legacy = (struct.pack("<4sBB", MAGIC, FAMILY_HLL, 1)
                  + struct.pack("<B", 12) + regs.tobytes())
        back = HllSketch.deserialize(legacy)
        assert not back.is_sparse
        assert back.estimate() == sk.estimate()
        assert (back.registers() == regs).all()
        # early sparse-phase builds wrote the v2 layout under version
        # byte 1 — the length fallback must not misread those either
        v2_payload = sk.serialize()[6:]
        mixed = struct.pack("<4sBB", MAGIC, FAMILY_HLL, 1) + v2_payload
        assert HllSketch.deserialize(mixed).estimate() == sk.estimate()
        # and current writes carry the current wire version
        from datasketches_spark_spark.sketches.serde import VERSION
        assert sk.serialize()[5] == VERSION

    def test_cross_family_merge_names_migration_path(self):
        import numpy as np
        import pytest
        from datasketches_spark_spark.sketches import HllSketch, ThetaSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        h, t = HllSketch(lgk=12), ThetaSketch(k=1024)
        h.update_hashes(hash_longs(np.arange(10, dtype=np.int64)))
        t.update_longs(np.arange(10, dtype=np.int64))
        with pytest.raises(ValueError,
                           match="approx_count_distinct_accumulate_theta"):
            h.merge(t)
        with pytest.raises(ValueError,
                           match="approx_count_distinct_accumulate_theta"):
            t.merge(h)


class TestThetaSetOps:
    def test_integer_cut_no_float_roundtrip(self):
        """The combined threshold is the exact integer kth+1 — a float64
        round-trip would move it by up to 2^11 near 2^64 and could overflow
        uint64 when kth is the max hash."""
        import numpy as np
        from datasketches_spark_spark.sketches import ThetaSketch
        a, b = ThetaSketch(k=16), ThetaSketch(k=16)
        # saturated sketch whose kth hash is 2^64 - 1: cut would be 2^64
        top = np.arange(2**64 - 16, 2**64, dtype=np.uint64)
        a._hashes = np.sort(top)
        b._hashes = np.sort(top)
        ha, hb, theta = a._setop_inputs(b)
        assert theta == 1.0 and ha.size == 16  # no overflow, nothing cut
        assert a.jaccard_estimate(b) == 1.0
        # odd boundary: kth+1 not representable in float64 — the boundary
        # hash kth itself must stay INCLUDED (hash < kth+1)
        kth = np.uint64(2**63 + 2**34 + 1)
        lows = np.arange(15, dtype=np.uint64)
        a._hashes = np.sort(np.concatenate([lows, [kth]]))
        b._hashes = a._hashes.copy()
        ha, hb, theta = a._setop_inputs(b)
        assert ha.size == 16 and hb.size == 16
        assert theta == (int(kth) + 1) / 2.0**64

    def _two(self, n_a, n_b, overlap, k=4096, seed=3):
        import numpy as np
        from datasketches_spark_spark.sketches import ThetaSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        rng = np.random.default_rng(seed)
        pool = rng.choice(2**62, size=n_a + n_b - overlap, replace=False)
        a_vals, b_vals = pool[:n_a], pool[n_a - overlap:]
        a, b = ThetaSketch(k=k), ThetaSketch(k=k)
        a.update_hashes(hash_longs(a_vals))
        b.update_hashes(hash_longs(b_vals))
        return a, b

    def test_exact_regime_set_ops(self):
        a, b = self._two(1000, 800, 300)
        assert a.intersection_estimate(b) == 300
        assert a.a_not_b_estimate(b) == 700
        assert b.a_not_b_estimate(a) == 500
        assert a.jaccard_estimate(b) == 300 / 1500

    def test_approximate_regime_within_bounds(self):
        a, b = self._two(200_000, 150_000, 60_000, k=4096)
        est_i = a.intersection_estimate(b)
        assert abs(est_i - 60_000) / 60_000 < 0.10
        est_j = a.jaccard_estimate(b)
        true_j = 60_000 / 290_000
        assert abs(est_j - true_j) / true_j < 0.10
        est_d = a.a_not_b_estimate(b)
        assert abs(est_d - 140_000) / 140_000 < 0.10

    def test_disjoint_and_identical(self):
        a, b = self._two(500, 500, 0)
        assert a.intersection_estimate(b) == 0
        assert a.jaccard_estimate(b) == 0.0
        assert a.jaccard_estimate(a) == 1.0
        assert a.a_not_b_estimate(a) == 0


class TestJoinSizeEstimate:
    """approx_join_size: exact-regime equality with the true join count,
    estimation-mode heavy-hitter behavior, null/corrupt handling."""

    def _states(self, spark, rows_a, rows_b, m=64):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        from pyspark.sql import functions as F
        dfa = spark.createDataFrame([Row(k=x) for x in rows_a])
        dfb = spark.createDataFrame([Row(k=x) for x in rows_b])
        sa = dfa.agg(dsf.approx_freqitems_accumulate(
            "k", item_type="long", max_map_size=m).alias("s")).collect()[0].s
        sb = dfb.agg(dsf.approx_freqitems_accumulate(
            "k", item_type="long", max_map_size=m).alias("s")).collect()[0].s
        return sa, sb

    def _jsize(self, spark, sa, sb):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame(
            [Row(a=bytearray(sa), b=bytearray(sb))])
        return df.select(
            dsf.approx_join_size("a", "b").alias("j")).collect()[0].j

    def test_exact_regime_matches_true_join(self, spark):
        import collections
        rows_a = [1, 1, 1, 2, 2, 3, 7]
        rows_b = [1, 2, 2, 2, 4]
        ca, cb = collections.Counter(rows_a), collections.Counter(rows_b)
        want = sum(ca[k] * cb[k] for k in ca)   # 3*1 + 2*3 = 9
        sa, sb = self._states(spark, rows_a, rows_b)
        assert self._jsize(spark, sa, sb) == want

    def test_disjoint_keys_zero(self, spark):
        sa, sb = self._states(spark, [1, 2, 3], [4, 5, 6])
        assert self._jsize(spark, sa, sb) == 0

    def test_estimation_mode_keeps_heavy_terms(self, spark):
        # tiny map forces purge; the two heavy keys dominate the true
        # join size and must keep the estimate within the sketch's
        # error envelope: est(k) in [true, true + maxErr] per side
        rows_a = [0] * 500 + [1] * 300 + list(range(100, 160))
        rows_b = [0] * 400 + [1] * 200 + list(range(130, 190))
        sa, sb = self._states(spark, rows_a, rows_b, m=8)
        est = self._jsize(spark, sa, sb)
        true_heavy = 500 * 400 + 300 * 200
        assert est >= true_heavy            # upper-bound estimates
        assert est <= true_heavy * 1.5      # errors stay sketch-bounded

    def test_null_and_corrupt(self, spark):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        sa, _ = self._states(spark, [1], [1])
        df = spark.createDataFrame(
            [Row(a=bytearray(sa), b=None),
             Row(a=bytearray(sa), b=bytearray(b"junkjunk"))],
            "a binary, b binary")
        out = [r.j for r in df.select(
            dsf.approx_join_size("a", "b").alias("j")).collect()]
        assert out == [None, None]


class TestKsDistance:
    """approx_ks_distance: exact-regime equality with brute-force KS."""

    def _state(self, spark, vals, k=262_144):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([Row(v=float(x)) for x in vals])
        return df.agg(dsf.approx_percentile_accumulate(
            "v", impl="MERGEABLE", k=k).alias("s")).collect()[0].s

    def _ks(self, spark, sa, sb):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([Row(a=bytearray(sa), b=bytearray(sb))])
        return df.select(
            dsf.approx_ks_distance("a", "b").alias("k")).collect()[0].k

    @staticmethod
    def _brute(a, b):
        xs = sorted(set(a) | set(b))
        fa = [sum(1 for v in a if v <= x) / len(a) for x in xs]
        fb = [sum(1 for v in b if v <= x) / len(b) for x in xs]
        return max(abs(p - q) for p, q in zip(fa, fb))

    def test_exact_matches_bruteforce(self, spark):
        import random
        rng = random.Random(11)
        a = [rng.randint(0, 40) for _ in range(200)]
        b = [rng.randint(10, 60) for _ in range(150)]
        sa, sb = self._state(spark, a), self._state(spark, b)
        assert self._ks(spark, sa, sb) == self._brute(a, b)

    def test_identical_zero_disjoint_one(self, spark):
        a = [1.0, 2.0, 3.0, 3.0]
        sa = self._state(spark, a)
        assert self._ks(spark, sa, sa) == 0.0
        sb = self._state(spark, [10.0, 11.0])
        assert self._ks(spark, sa, sb) == 1.0

    def test_estimation_mode_bounded(self, spark):
        # same distribution through two small-k sketches: the measured
        # distance must stay inside the summed rank-error envelopes
        # (KLL k=128 normalized rank error ~1.7%; generous 10% bound)
        import random
        rng = random.Random(5)
        vals = [rng.gauss(0, 1) for _ in range(20_000)]
        sa = self._state(spark, vals[:10_000], k=128)
        sb = self._state(spark, vals[10_000:], k=128)
        assert self._ks(spark, sa, sb) < 0.10

    def test_null_and_corrupt(self, spark):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        sa = self._state(spark, [1.0])
        df = spark.createDataFrame(
            [Row(a=bytearray(sa), b=None),
             Row(a=bytearray(sa), b=bytearray(b"nope"))],
            "a binary, b binary")
        out = [r.k for r in df.select(
            dsf.approx_ks_distance("a", "b").alias("k")).collect()]
        assert out == [None, None]


class TestExactExtremaTracking:
    """r15 verdict finding #1: compaction drops extreme items, so
    quantile(0)/quantile(1)/min_value/max_value/PMF anchoring must come
    from EXACT tracked extrema (the DataSketches getMinValue/getMaxValue
    contract), not the retained multiset. The judge's deterministic
    repros are pinned here."""

    def test_judge_repro_n34(self):
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch, ReqSketch
        for cls, kw in ((KllSketch, {"k": 32, "dtype": np.float32}),
                        (ReqSketch, {"k": 8})):
            sk = cls(**kw)
            sk.update_batch(np.asarray([0.0] * 33 + [-1.0]))
            assert sk.quantile(0.0) == -1.0
            assert sk.min_value == -1.0
            assert sk.quantile(1.0) == 0.0

    def test_judge_repro_n502_both_families(self):
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch, ReqSketch
        vals = np.concatenate([np.zeros(501), [-1.0]])
        for cls, kw in ((KllSketch, {"k": 32, "dtype": np.float32}),
                        (ReqSketch, {"k": 8})):
            sk = cls(**kw)
            sk.update_batch(vals)
            assert sk.quantile(0.0) == -1.0 and sk.quantile(1.0) == 0.0

    def test_extrema_survive_merge_and_serde(self):
        import numpy as np
        from datasketches_spark_spark.sketches import (
            KllSketch, ReqSketch, deserialize_any)
        rng = np.random.default_rng(42)
        arr = rng.normal(size=4000).astype(np.float32)
        for cls, kw in ((KllSketch, {"k": 16, "dtype": np.float32}),
                        (ReqSketch, {"k": 4})):
            parts = []
            for chunk in np.array_split(arr, 13):
                s = cls(**kw)
                s.update_batch(chunk)
                parts.append(deserialize_any(s.serialize()))
            m = parts[0]
            for p in parts[1:]:
                m = m.merge(p)
            back = deserialize_any(m.serialize())
            assert back.min_value == float(arr.min())
            assert back.max_value == float(arr.max())
            assert back.quantile(0.0) == float(arr.min())
            assert back.quantile(1.0) == float(arr.max())

    def test_pmf_anchors_at_exact_min(self):
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch
        # single far-left outlier that compaction is near-certain to
        # drop from the retained set
        sk = KllSketch(k=16, dtype=np.float32)
        sk.update_batch(np.concatenate([[-100.0],
                                        np.full(2000, 10.0)]))
        masses = sk.pmf(4)
        # bins span [-100, 10]; almost all mass lies in the LAST bin —
        # a retained-min anchor would smear it across earlier bins
        assert len(masses) == 4
        assert masses[-1] >= 0.99
        assert abs(sum(masses) - 1.0) < 1e-9

    def test_pre_v3_engine_state_still_decodes(self):
        import struct
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch
        from datasketches_spark_spark.sketches.serde import (
            MAGIC, FAMILY_KLL)
        # hand-build a v2 payload: k, dtype code, n, levels (no extrema)
        items = np.asarray([3.0, 1.0, 2.0], dtype=np.float32)
        payload = (struct.pack("<IBQ", 16, 0, 3)
                   + struct.pack("<HI", 1, 3) + items.tobytes())
        legacy = struct.pack("<4sBB", MAGIC, FAMILY_KLL, 2) + payload
        sk = KllSketch.deserialize(legacy)
        assert sk.n == 3
        # no stored extrema -> retained fallback
        assert sk.min_value == 1.0 and sk.max_value == 3.0
        assert sk.quantile(0.0) == 1.0 and sk.quantile(1.0) == 3.0

    def test_imported_datasketches_min_max_consumed(self):
        # foreign KLL image whose STORED min/max exceed the retained
        # range must answer rank-0/1 from the stored fields
        import struct
        from datasketches_spark_spark.sketches import (
            deserialize_quantile)
        header = struct.pack("<BBBBHBB", 5, 1, 15, 0, 20, 8, 0)
        header += struct.pack("<Q", 12)
        header += struct.pack("<HBB", 20, 2, 0)
        header += struct.pack("<ii", 12, 16)
        header += struct.pack("<ff", -7.0, 95.0)   # stored exact extrema
        lvl0 = [5.0, 1.0, 9.0, 3.0]
        lvl1 = [10.0, 90.0, 30.0, 50.0]
        blob = header + struct.pack("<8f", *(lvl0 + lvl1))
        sk = deserialize_quantile(blob)
        assert sk.quantile(0.0) == -7.0 and sk.quantile(1.0) == 95.0
        # and a serde round-trip keeps them
        from datasketches_spark_spark.sketches import deserialize_any
        back = deserialize_any(sk.serialize())
        assert back.min_value == -7.0 and back.max_value == 95.0

    def test_pre_v3_state_update_and_merge_keep_retained_extrema(self):
        """r16 review finding: combining NEW data into a pre-v3
        decoded state (no tracked extrema) must seed min/max from the
        retained items first — else update/merge clobber the old
        state's range with only the new data's."""
        import struct
        import numpy as np
        from datasketches_spark_spark.sketches import KllSketch
        from datasketches_spark_spark.sketches.serde import (
            MAGIC, FAMILY_KLL)

        def legacy(items):
            a = np.asarray(items, dtype=np.float32)
            payload = (struct.pack("<IBQ", 16, 0, a.size)
                       + struct.pack("<HI", 1, a.size) + a.tobytes())
            return struct.pack("<4sBB", MAGIC, FAMILY_KLL, 2) + payload

        sk = KllSketch.deserialize(legacy([1.0, 7.0, 3.0]))
        sk.update(500.0)
        assert sk.min_value == 1.0 and sk.max_value == 500.0
        assert sk.quantile(0.0) == 1.0

        acc = KllSketch.deserialize(legacy([1.0, 7.0, 3.0]))
        other = KllSketch(k=16, dtype=np.float32)
        other.update_batch(np.asarray([50.0, 60.0]))
        acc.merge(other)
        assert acc.min_value == 1.0 and acc.max_value == 60.0
        assert acc.quantile(0.0) == 1.0 and acc.quantile(1.0) == 60.0
