"""CPC wire-format decoder validation against datasketches-java goldens.

``tests/data/cpc_fixtures.json`` holds serialized images generated from
datasketches-java 6.2.0 (the library the reference engine serializes
with — ``distinctCntSketches.scala:57-66``; generator in ``devtools/``)
across every flavor (EMPTY/SPARSE/HYBRID/PINNED/SLIDING), merged and
HIP forms, long and string items, lgK 4..16, plus ground truth for each:
the library's estimate, its coupon bit matrix (sha256), and its coupon
count. The decoder must reproduce the bit matrix EXACTLY and the
estimate to 1e-9 — matrix equality is the strongest possible check, as
every decompressed bit participates.

Also validated: the helper functions (flavor/offset/pseudo-phase/Golomb
base bits/ICON estimator) against dense JVM parameter sweeps, and
CPC-to-CPC union (incl. mixed-lgK downsampling in both directions)
against ``CpcUnion`` results.
"""

import hashlib
import json
import math
import os

import numpy as np
import pytest

from datasketches_spark_spark.compat import cpc
from datasketches_spark_spark.sketches import CpcUnionSketch, deserialize_any

_FIXTURES = os.path.join(os.path.dirname(__file__), "data",
                         "cpc_fixtures.json")


@pytest.fixture(scope="module")
def fx():
    with open(_FIXTURES) as f:
        return json.load(f)


class TestHelperSweeps:
    def test_pseudo_phase(self, fx):
        for lgk, c, want in fx["helpers"]["pseudo_phase"]:
            assert cpc._determine_pseudo_phase(lgk, c) == want, (lgk, c)

    def test_offset(self, fx):
        for lgk, c, want in fx["helpers"]["offset"]:
            assert cpc._determine_correct_offset(lgk, c) == want, (lgk, c)

    def test_flavor(self, fx):
        for lgk, c, want in fx["helpers"]["flavor"]:
            assert cpc._determine_flavor(lgk, c) == want, (lgk, c)

    def test_golomb_base_bits(self, fx):
        for k, cnt, want in fx["helpers"]["golomb_base_bits"]:
            if cnt <= k:
                assert cpc._golomb_base_bits(k, cnt) == want, (k, cnt)

    def test_icon_estimate(self, fx):
        for lgk, c, want in fx["helpers"]["icon"]:
            got = cpc.icon_estimate(lgk, c)
            if math.isinf(want):
                assert math.isinf(got), (lgk, c)
            else:
                assert got == pytest.approx(want, rel=1e-9), (lgk, c)


class TestImageDecode:
    def test_all_fixture_images(self, fx):
        """Every image: estimate to 1e-9 and bit matrix sha-exact."""
        flavors_seen = set()
        formats_seen = set()
        for s in fx["sketches"]:
            b = bytes.fromhex(s["bytes"])
            img = cpc.parse(b)
            flavors_seen.add(s["flavor"])
            formats_seen.add(img.fmt)
            got = cpc.estimate(img)
            assert got == pytest.approx(s["estimate"], rel=1e-9, abs=1e-9), \
                (s["lgk"], s["n"], s["merged"], s["flavor"])
            m = cpc.bit_matrix(img)
            sha = hashlib.sha256(m.astype("<i8").tobytes()).hexdigest()
            assert sha == s["matrix_sha"], \
                (s["lgk"], s["n"], s["merged"], s["flavor"])
            assert cpc._popcount(m) == s["popcount"]
        assert flavors_seen == {"EMPTY", "SPARSE", "HYBRID", "PINNED",
                                "SLIDING"}
        # all six non-NOSV formats occur; NOSV images (empty pair table
        # with a window) are rare transients the parser also handles
        assert {0, 1, 2, 3, 6, 7} <= formats_seen

    def test_small_matrices_bitwise(self, fx):
        """lgk <= 8 fixtures also carry the full matrix for bit-level
        debugging; compare row by row."""
        checked = 0
        for s in fx["sketches"]:
            if not s.get("matrix"):
                continue
            m = cpc.bit_matrix(bytes.fromhex(s["bytes"]))
            want = np.array(
                [int.from_bytes(bytes.fromhex(h), "little") for h in s["matrix"]],
                np.uint64)
            assert (m == want).all(), (s["lgk"], s["n"], s["flavor"])
            checked += 1
        assert checked > 30

    def test_corrupt_rejected(self):
        with pytest.raises(ValueError):
            cpc.parse(b"\x02\x01\x10")  # truncated preamble
        with pytest.raises(ValueError):
            # wrong family byte
            cpc.parse(bytes([2, 1, 15, 11, 0, 2, 0, 0]))
        with pytest.raises(ValueError):
            # preamble ints inconsistent with format
            cpc.parse(bytes([9, 1, 16, 11, 0, 0x1e, 0, 0] + [0] * 44))


class TestUnion:
    def test_union_fixtures(self, fx):
        for u in fx["unions"]:
            st = cpc.CpcUnionState()
            st.update(bytes.fromhex(u["bytes_a"]))
            st.update(bytes.fromhex(u["bytes_b"]))
            assert st.num_coupons() == u["union_num_coupons"]
            assert st.estimate() == pytest.approx(u["union_estimate"],
                                                  rel=1e-9)

    def test_engine_sketch_merge_matches_union_state(self, fx):
        u = fx["unions"][1]
        a = CpcUnionSketch.from_datasketches(bytes.fromhex(u["bytes_a"]))
        b = CpcUnionSketch.from_datasketches(bytes.fromhex(u["bytes_b"]))
        merged = a.merge(b)
        assert merged.estimate() == int(round(u["union_estimate"]))
        # serialize -> deserialize -> merge again is idempotent
        rt = deserialize_any(merged.serialize())
        assert rt.merge(a).estimate() == merged.estimate()

    def test_single_image_keeps_hip_estimate(self, fx):
        """An un-merged HIP image must estimate via its HIP accumulator
        (what CpcSketch.getEstimate returns), not ICON."""
        s = next(x for x in fx["sketches"]
                 if not x["merged"] and x["flavor"] == "SLIDING")
        sk = CpcUnionSketch.from_datasketches(bytes.fromhex(s["bytes"]))
        assert sk.estimate() == int(round(s["estimate"]))
        # and survives the engine-envelope round trip
        assert deserialize_any(sk.serialize()).estimate() == sk.estimate()

    def test_merge_rejects_foreign_families(self):
        from datasketches_spark_spark.sketches import ThetaSketch
        sk = CpcUnionSketch(11)
        with pytest.raises(ValueError, match="CPC"):
            sk.merge(ThetaSketch(k=16))


class TestEncode:
    """CPC wire ENCODE (serialize_matrix / CpcUnionSketch.to_datasketches):
    byte-exact against the datasketches-java golden images."""

    def test_union_results_byte_exact(self, fx):
        """The operation the encoder implements is
        CpcUnion.getResult().toByteArray(): all committed Java union
        results must reproduce bit-for-bit."""
        from datasketches_spark_spark.compat import cpc
        for u in fx["unions"]:
            st = cpc.CpcUnionState()
            st.update(bytes.fromhex(u["bytes_a"]))
            st.update(bytes.fromhex(u["bytes_b"]))
            assert cpc.serialize_matrix(st.matrix, st.lgk) == \
                bytes.fromhex(u["union_bytes"])

    def test_merged_images_byte_exact(self, fx):
        """Merged live-sketch images re-encode byte-exactly except for the
        fiCol preamble byte, which is PATH-DEPENDENT in a live Java sketch
        (it lags column saturation depending on update order, so no
        function of the final matrix can always reproduce it; the encoder
        writes the saturated-column count, which Java's reader accepts —
        fiCol never feeds decoding). Everything after byte 4 must match on
        every merged fixture; the whole image on all but the known
        saturation-lag cases."""
        from datasketches_spark_spark.compat import cpc
        whole = tail = total = 0
        for s in fx["sketches"]:
            if not s["merged"]:
                continue
            orig = bytes.fromhex(s["bytes"])
            img = cpc.parse(orig)
            enc = cpc.serialize_matrix(cpc.bit_matrix(img), img.lgk,
                                       img.seed_hash)
            total += 1
            tail += (enc[:4] == orig[:4] and enc[5:] == orig[5:]
                     and len(enc) == len(orig))
            whole += enc == orig
        assert total == 96 and tail == total
        assert whole >= 93  # 3 known live-fiCol saturation-lag fixtures

    def test_roundtrip_every_fixture(self, fx):
        """decode -> encode -> decode preserves the coupon matrix and the
        coupon count for ALL 192 images (HIP images re-encode as merged:
        the union output format; their ICON estimate stays in family)."""
        import numpy as np
        from datasketches_spark_spark.compat import cpc
        for s in fx["sketches"]:
            img = cpc.parse(bytes.fromhex(s["bytes"]))
            m = cpc.bit_matrix(img)
            img2 = cpc.parse(cpc.serialize_matrix(m, img.lgk,
                                                  img.seed_hash))
            assert img2.num_coupons == img.num_coupons
            assert np.array_equal(cpc.bit_matrix(img2), m)
            assert not img2.has_hip  # merged by design

    def test_engine_state_exports_cpc_wire(self, fx):
        """Engine CPC-union states flow through to_datasketches_state into
        Java-readable CPC bytes, seed hash preserved."""
        from datasketches_spark_spark.compat import (cpc,
                                                     to_datasketches_state)
        from datasketches_spark_spark.sketches import CpcUnionSketch
        u = fx["unions"][0]
        a = CpcUnionSketch.from_datasketches(bytes.fromhex(u["bytes_a"]))
        b = CpcUnionSketch.from_datasketches(bytes.fromhex(u["bytes_b"]))
        merged = a.merge(b)
        wire = to_datasketches_state(merged.serialize())
        assert wire == bytes.fromhex(u["union_bytes"])
        img = cpc.parse(wire)
        assert img.seed_hash == cpc.DEFAULT_SEED_HASH

    def test_cross_seed_union_refused(self, fx):
        from datasketches_spark_spark.sketches import CpcUnionSketch
        u = fx["unions"][0]
        a = CpcUnionSketch.from_datasketches(bytes.fromhex(u["bytes_a"]))
        b = CpcUnionSketch.from_datasketches(bytes.fromhex(u["bytes_b"]))
        b.seed_hash ^= 0x1234
        with pytest.raises(ValueError, match="seed hash"):
            a.merge(b)

    def test_envelope_roundtrip_keeps_seed_hash(self, fx):
        from datasketches_spark_spark.sketches import CpcUnionSketch
        s = next(s for s in fx["sketches"] if s["flavor"] == "PINNED")
        sk = CpcUnionSketch.from_datasketches(bytes.fromhex(s["bytes"]))
        sk.seed_hash = 0xBEEF
        rt = CpcUnionSketch.deserialize(sk.serialize())
        assert rt.seed_hash == 0xBEEF and rt.lgk == sk.lgk
        assert rt.estimate() == sk.estimate()


class TestJavaCrossValidation:
    """The strongest encoder check available in-environment: the REAL
    datasketches-java (on Spark's driver classpath) must heapify the
    engine's encoded CPC bytes and agree on the estimate — no shared code
    with the Python encoder."""

    def _jcpc(self, spark):
        return spark._jvm.org.apache.datasketches.cpc.CpcSketch

    def test_java_heapifies_engine_union_bytes(self, spark, fx):
        from datasketches_spark_spark.compat import cpc
        jcpc = self._jcpc(spark)
        for u in fx["unions"]:
            st = cpc.CpcUnionState()
            st.update(bytes.fromhex(u["bytes_a"]))
            st.update(bytes.fromhex(u["bytes_b"]))
            wire = cpc.serialize_matrix(st.matrix, st.lgk)
            jsk = jcpc.heapify(bytearray(wire))
            assert abs(jsk.getEstimate() - u["union_estimate"]) < 1e-9
            assert jsk.toByteArray() is not None  # re-serializable there

    def test_java_roundtrips_fresh_engine_encoding(self, spark):
        """Build CPC states in Java, union them in the ENGINE, export,
        and let Java read the result: estimates must be exact in the
        sparse regime."""
        from datasketches_spark_spark.sketches import CpcUnionSketch
        jcpc = self._jcpc(spark)
        a, b = jcpc(11), jcpc(11)
        for i in range(40):
            a.update(f"item-{i}")
        for i in range(25, 70):
            b.update(f"item-{i}")
        ea = CpcUnionSketch.from_datasketches(bytes(a.toByteArray()))
        eb = CpcUnionSketch.from_datasketches(bytes(b.toByteArray()))
        wire = ea.merge(eb).to_datasketches()
        jsk = jcpc.heapify(bytearray(wire))
        assert round(jsk.getEstimate()) == 70  # exact regime at lgK=11


class TestCpcAccumulate:
    """Genuine-CPC accumulate: raw values -> wire-compatible CPC states
    whose coupons are bit-identical to datasketches-java's."""

    def test_reproduces_every_fixture_matrix_from_raw_updates(self, fx):
        """Replay each fixture's exact update stream through the engine's
        hash+coupon path: the coupon matrix must equal the one
        datasketches-java built (182/182 non-empty fixtures)."""
        import hashlib
        import struct as _struct
        import numpy as np
        from datasketches_spark_spark.sketches import CpcAccumulator
        checked = ok = 0
        for s in fx["sketches"]:
            if s["n"] == 0:
                continue
            lgk, n = s["lgk"], s["n"]
            salt = 3 if lgk == 16 else (n % 7 if s["items"] == "long" else 1)
            acc = CpcAccumulator(lgk)
            if s["items"] == "long":
                with np.errstate(over="ignore"):
                    acc.update_longs(np.arange(n, dtype=np.int64)
                                     * np.int64(982451653) + np.int64(salt))
            else:
                acc.update_strings([f"item-1-{i}" for i in range(n)])
            got = hashlib.sha256(b"".join(
                _struct.pack("<q", int(x))
                for x in acc.matrix.view(np.int64))).hexdigest()
            checked += 1
            ok += got == s["matrix_sha"]
        assert checked == 182 and ok == checked

    def test_murmur3_matches_java(self, spark):
        import numpy as np
        from datasketches_spark_spark.sketches.murmur3 import (hash128,
                                                               hash128_longs)
        jmm = spark._jvm.org.apache.datasketches.hash.MurmurHash3
        gw = spark.sparkContext._gateway
        m = (1 << 64) - 1
        for v in (0, 1, -1, 9001, 2**63 - 1, -2**63, 123456789012345):
            arr = gw.new_array(spark._jvm.long, 1)
            arr[0] = v
            jh = jmm.hash(arr, 9001)
            h1, h2 = hash128_longs(np.array([v], np.int64))
            assert (int(h1[0]), int(h2[0])) == (jh[0] & m, jh[1] & m), v
        for s in ("a", "hello", "x" * 15, "y" * 16, "unicode-é漢字",
                  "z" * 33):
            b = s.encode("utf-8")
            jh = jmm.hash(bytearray(b), 9001)
            assert hash128(b) == (jh[0] & m, jh[1] & m), s

    def test_engine_sketch_unions_with_java_sketch(self, spark):
        """The interop contract: a sketch accumulated HERE unions with one
        accumulated THERE over overlapping data and the result equals the
        all-Java union — byte-for-byte after the engine's merge."""
        from datasketches_spark_spark.sketches import (CpcAccumulator,
                                                       CpcUnionSketch)
        jvm = spark._jvm
        jsk = jvm.org.apache.datasketches.cpc.CpcSketch(11)
        for i in range(40, 120):
            jsk.update(f"user-{i}")
        ours = CpcAccumulator(11)
        ours.update_strings([f"user-{i}" for i in range(80)])
        merged = ours.merge(
            CpcUnionSketch.from_datasketches(bytes(jsk.toByteArray())))
        # all-Java reference result
        ju = jvm.org.apache.datasketches.cpc.CpcUnion(11)
        ju.update(jsk)
        jb = jvm.org.apache.datasketches.cpc.CpcSketch(11)
        for i in range(80):
            jb.update(f"user-{i}")
        ju.update(jb)
        assert merged.to_datasketches() == bytes(
            ju.getResult().toByteArray())
        assert merged.estimate() == round(ju.getResult().getEstimate())

    def test_accumulate_udf_sql_and_dss(self, spark, fx):
        """Both SQL surfaces: the registered UDF emits CPC wire bytes
        (family 16) readable by Java; the dss.sql two-phase path
        estimates identically."""
        import datasketches_spark_spark as dss
        from datasketches_spark_spark.compat import cpc
        dss.install(spark)
        spark.createDataFrame(
            [(f"g{i % 3}", f"u{i % 57}") for i in range(500)],
            "g string, u string").createOrReplaceTempView("cpc_acc_t")
        rows = spark.sql(
            "SELECT g, approx_count_distinct_accumulate_cpc(u) AS st "
            "FROM cpc_acc_t GROUP BY g").collect()
        assert len(rows) == 3
        jcpc = spark._jvm.org.apache.datasketches.cpc.CpcSketch
        for r in rows:
            img = cpc.parse(bytes(r.st))  # genuine family-16 wire bytes
            est = round(jcpc.heapify(bytearray(bytes(r.st))).getEstimate())
            assert est == round(cpc.estimate(img))
        (row,) = spark.sql(
            "SELECT approx_count_distinct_estimate("
            "  approx_count_distinct_combine(st)) AS ndv FROM ("
            "  SELECT g, approx_count_distinct_accumulate_cpc(u) AS st "
            "  FROM cpc_acc_t GROUP BY g)").collect()
        # CPC is round-exact only absent coupon collisions (57 items in a
        # 2^17-coupon space collide with p ~ 1%; this seed set does once)
        assert abs(row.ndv - 57) <= 1
        out = dss.sql(spark, (
            "SELECT g, approx_count_distinct_accumulate_cpc(u) AS st "
            "FROM cpc_acc_t GROUP BY g ORDER BY g"))
        got = {r.g: bytes(r.st) for r in out.collect()}
        want = {r.g: bytes(r.st) for r in rows}
        assert got == want  # two-phase partials merge to identical states

    def test_long_variant(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        (row,) = spark.sql(
            "SELECT approx_count_distinct_estimate("
            "approx_count_distinct_accumulate_cpc_long(CAST(c AS LONG)))"
            " AS ndv FROM VALUES (1), (2), (2), (null), (3) AS t(c)"
        ).collect()
        assert row.ndv == 3


class TestReviewHardening:
    """Round-7 review findings: corrupt-stream bounds, rehydrated-state
    updatability, RIFF header size, lgK=26 collision rule."""

    def test_corrupt_pair_stream_raises_not_hangs(self):
        import struct as _struct
        from datasketches_spark_spark.compat import cpc
        # SPARSE_HYBRID_MERGED claiming 2 coupons with a pair stream that
        # ends inside a Golomb unary run: must raise, never spin
        pre = _struct.pack("<6BH", 4, 1, 16, 11, 0, 2 | 8, 0x93CC)
        body = _struct.pack("<2I", 2, 1) + _struct.pack("<I", 0x1)
        with pytest.raises(ValueError, match="corrupt CPC"):
            cpc.bit_matrix(pre + body)

    def test_valid_images_still_decode_with_bound(self, fx):
        from datasketches_spark_spark.compat import cpc
        for s in fx["sketches"][:40]:
            cpc.bit_matrix(bytes.fromhex(s["bytes"]))  # must not raise

    def test_rehydrated_wire_state_stays_updatable(self):
        """Streaming resume path: a CPC state rehydrated from wire bytes
        via deserialize_any must accept further update_hashes128 calls
        (the cpcwire family folds into resumed states on trigger 2+)."""
        import numpy as np
        from datasketches_spark_spark.sketches import (CpcAccumulator,
                                                       deserialize_any)
        acc = CpcAccumulator(11)
        acc.update_longs(np.arange(50, dtype=np.int64))
        back = deserialize_any(acc.serialize())
        from datasketches_spark_spark.sketches.murmur3 import hash128_longs
        back.update_hashes128(*hash128_longs(
            np.arange(25, 80, dtype=np.int64)))
        ref = CpcAccumulator(11)
        ref.update_longs(np.arange(80, dtype=np.int64))
        assert np.array_equal(back.matrix, ref.matrix)
        assert back.serialize() == ref.serialize()

    def test_riff_size_field_is_spec_exact(self):
        import struct as _struct
        import numpy as np
        from datasketches_spark_spark.operators import encode_wav
        data = encode_wav(np.zeros(10), 8000)
        assert _struct.unpack_from("<I", data, 4)[0] == len(data) - 8

    def test_resample_empty_is_empty(self):
        import numpy as np
        from datasketches_spark_spark.operators import resample_nearest
        out = resample_nearest(np.zeros((0, 2)), 8000, 16000)
        assert out.shape[0] == 0

    def test_cross_seed_union_state_refused(self, fx):
        from datasketches_spark_spark.compat import cpc
        u = fx["unions"][0]
        st = cpc.CpcUnionState()
        st.update(bytes.fromhex(u["bytes_a"]))
        other = bytearray(bytes.fromhex(u["bytes_b"]))
        other[6] ^= 0x55  # flip seed hash bytes
        with pytest.raises(ValueError, match="seed hash"):
            st.update(bytes(other))

    def test_lgk26_allones_coupon_folds(self):
        import numpy as np
        from datasketches_spark_spark.sketches import CpcAccumulator
        acc = CpcAccumulator(26)
        k = 1 << 26
        # inject the all-ones hash pair directly: must land on row k-2
        acc.update_hashes128(np.array([np.uint64(k - 1)], np.uint64),
                             np.array([np.uint64(0)], np.uint64))
        assert int(acc.matrix[k - 1]) == 0
        assert int(acc.matrix[k - 2]) == 1 << 63
