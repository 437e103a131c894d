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
