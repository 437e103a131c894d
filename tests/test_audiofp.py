"""Audio fingerprinting (operators/audiofp.py, r15) — the audio
analog of pHash dedup: gain-robust, content-separating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators.audiocodec import encode_wav
from datasketches_spark_spark.operators.audiofp import (
    audio_fingerprint,
    audio_fingerprint_bytes,
    audio_fp_similarity,
    audio_subfingerprints,
    fp_hamming_fraction,
    pack_subfingerprints,
)

RATE = 8000


def melody(seed: int, amp: float = 0.8) -> np.ndarray:
    """Onset-rich deterministic clip — the spectro-temporal variation
    the scheme keys on (stationary tones give near-zero differences
    whose signs are noise)."""
    rng = np.random.default_rng(seed)
    notes = rng.choice([262, 294, 330, 349, 392, 440, 494, 523,
                        587, 659, 740, 831], size=10)
    seg = RATE // 10
    t = np.arange(seg) / RATE
    parts = []
    for f in notes:
        att = np.minimum(1.0, np.arange(seg) / (0.01 * RATE))
        dec = np.exp(-3.0 * np.arange(seg) / seg)
        parts.append(np.sin(2 * np.pi * f * t) * att * dec)
    x = np.concatenate(parts)
    return amp * x / np.max(np.abs(x))


class TestKernel:
    def test_separation_contract(self):
        """The measured thresholds the module docstring promises:
        gain <= ~0.09, codec/noise < cross floor, cross >= ~0.42."""
        base = {s: audio_fingerprint_bytes(encode_wav(melody(s), RATE))
                for s in range(5)}
        gain, cross = [], []
        for s in range(5):
            for amp in (0.2, 0.5, 0.9):
                fp = audio_fingerprint_bytes(
                    encode_wav(melody(s, amp), RATE))
                gain.append(fp_hamming_fraction(base[s], fp))
        import itertools
        for a, b in itertools.combinations(range(5), 2):
            cross.append(fp_hamming_fraction(base[a], base[b]))
        assert max(gain) < 0.15, gain
        assert min(cross) > 0.35, cross
        # codec roundtrip + low-level noise stay under the cross floor
        g711 = audio_fingerprint_bytes(
            encode_wav(melody(0), RATE, codec="ulaw"))
        noisy = np.clip(melody(0) + np.random.default_rng(9)
                        .normal(0, 0.002, RATE), -1, 1)
        fn = audio_fingerprint_bytes(encode_wav(noisy, RATE))
        assert fp_hamming_fraction(base[0], g711) < min(cross)
        assert fp_hamming_fraction(base[0], fn) < min(cross)

    def test_determinism_and_packing(self):
        a = audio_fingerprint_bytes(encode_wav(melody(3), RATE))
        b = audio_fingerprint_bytes(encode_wav(melody(3), RATE))
        assert a == b and len(a) % 2 == 0 and len(a) > 0
        # kernel parity on the DECODED (16-bit-quantized) samples —
        # the unquantized float clip fingerprints slightly differently
        from datasketches_spark_spark.operators.audiocodec import (
            decode_wav)
        samples, rate = decode_wav(encode_wav(melody(3), RATE))
        bits = audio_subfingerprints(samples, rate)
        assert pack_subfingerprints(bits) == a
        assert fp_hamming_fraction(a, a) == 0.0

    def test_edge_inputs(self):
        assert audio_fingerprint_bytes(b"not audio") is None
        silent = audio_fingerprint_bytes(
            encode_wav(np.zeros(RATE), RATE))
        assert silent == b"\x00\x00" * (len(silent) // 2)
        short = audio_subfingerprints(np.ones(100), RATE)
        assert short.shape == (0, 16)
        assert pack_subfingerprints(short) == b""
        assert fp_hamming_fraction(b"", b"\x00") is None
        # stereo mixes down
        st = np.stack([melody(1), melody(1)], axis=1)
        assert audio_subfingerprints(st, RATE).shape[1] == 16


class TestColumns:
    def test_fingerprint_and_similarity_columns(self, spark):
        rows = []
        for i in range(12):
            seed, amp = i % 3, (i % 4 + 2) / 6
            rows.append((i, seed,
                         bytearray(encode_wav(melody(seed, amp), RATE))))
        rows.append((99, -1, bytearray(b"junk")))
        df = spark.createDataFrame(
            rows, "id long, grp int, wav binary")
        fps = df.select("id", "grp",
                        audio_fingerprint("wav").alias("fp"))
        got = {r.id: r for r in fps.collect()}
        assert got[99].fp is None
        # same-group sims high, cross-group low — via the pair column
        reps = {g: got[g].fp for g in range(3)}   # ids 0,1,2 = seeds 0,1,2
        pair_rows = [(r.id, bytes(r.fp), bytes(reps[r.grp]),
                      bytes(reps[(r.grp + 1) % 3]))
                     for r in got.values() if r.fp is not None]
        pairs = spark.createDataFrame(
            pair_rows, "id long, fp binary, same binary, other binary")
        sims = pairs.select(
            "id",
            audio_fp_similarity("fp", "same").alias("s_same"),
            audio_fp_similarity("fp", "other").alias("s_other"))
        for r in sims.collect():
            assert r.s_same > 0.85, (r.id, r.s_same)
            assert r.s_other < 0.65, (r.id, r.s_other)

    def test_scan_stage(self, spark):
        df = spark.createDataFrame(
            [(bytearray(encode_wav(melody(0), RATE)),)], "wav binary")
        plan = df.select(audio_fingerprint("wav")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestNearDupPairs:
    """r15: audio_neardup_pairs — banded positional-gram buckets +
    Hamming verify, never all-pairs."""

    def _clips(self, spark):
        rows = []
        i = 0
        for seed in range(3):
            for amp in (0.3, 0.6, 0.9):
                rows.append((i, seed, bytearray(
                    encode_wav(melody(seed, amp), RATE))))
                i += 1
        return spark.createDataFrame(
            rows, "id long, grp int, wav binary")

    def test_finds_groups_and_only_groups(self, spark):
        from datasketches_spark_spark.operators import (
            audio_fingerprint, audio_neardup_pairs)
        df = self._clips(spark)
        fps = df.select("id", "grp",
                        audio_fingerprint("wav").alias("fp"))
        pairs = audio_neardup_pairs(fps, "id", min_sim=0.72).collect()
        grp = {r.id: r.grp for r in df.select("id", "grp").collect()}
        found = {(p.id_a, p.id_b) for p in pairs}
        # every within-group pair found, no cross-group pair
        import itertools
        by_g = {}
        for i, g in grp.items():
            by_g.setdefault(g, []).append(i)
        want = set()
        for g, ids in by_g.items():
            want |= {tuple(sorted(p))
                     for p in itertools.combinations(ids, 2)}
        assert found == want, (sorted(found), sorted(want))
        assert all(p.sim > 0.72 for p in pairs)

    def test_bucket_cap_drops_degenerate(self, spark):
        from datasketches_spark_spark.operators import (
            audio_fingerprint, audio_neardup_pairs)
        # many identical silent clips -> one mega-bucket per position:
        # the cap drops them instead of exploding quadratically
        sil = bytearray(encode_wav(np.zeros(RATE), RATE))
        df = spark.createDataFrame(
            [(i, sil) for i in range(12)], "id long, wav binary")
        fps = df.select("id", audio_fingerprint("wav").alias("fp"))
        n = audio_neardup_pairs(fps, "id", max_bucket=5).count()
        assert n == 0
        # with the cap lifted the silent clips all pair up
        n2 = audio_neardup_pairs(fps, "id", max_bucket=100).count()
        assert n2 == 12 * 11 // 2

    def test_no_cartesian_in_plan(self, spark):
        from datasketches_spark_spark.operators import (
            audio_fingerprint, audio_neardup_pairs)
        df = self._clips(spark)
        fps = df.select("id", audio_fingerprint("wav").alias("fp"))
        plan = audio_neardup_pairs(fps, "id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestReviewRegressions:
    """r15 second-review findings, pinned."""

    def test_descending_id_order_pairs_survive(self, spark):
        """A bucket whose collect_list arrives descending must not
        lose its pairs to an ordering filter (canonicalized via
        least/greatest now)."""
        from datasketches_spark_spark.operators import (
            audio_fingerprint, audio_neardup_pairs)
        rows = [(5, bytearray(encode_wav(melody(0, 0.9), RATE))),
                (3, bytearray(encode_wav(melody(0, 0.4), RATE)))]
        df = spark.createDataFrame(rows, "id long, wav binary") \
            .coalesce(1).sortWithinPartitions(F.desc("id"))
        fps = df.select("id", audio_fingerprint("wav").alias("fp"))
        got = audio_neardup_pairs(fps, "id", min_sim=0.7).collect()
        assert [(p.id_a, p.id_b) for p in got] == [(3, 5)]

    def test_truncated_wav_nulls_not_crashes(self, spark):
        """struct.error from a truncated RIFF header must surface as
        the documented None, not kill the scan."""
        trunc = b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00"
        assert audio_fingerprint_bytes(trunc) is None
        df = spark.createDataFrame(
            [(1, bytearray(trunc)),
             (2, bytearray(encode_wav(melody(0), RATE)))],
            "id long, wav binary")
        got = {r.id: r.fp for r in df.select(
            "id", audio_fingerprint("wav").alias("fp")).collect()}
        assert got[1] is None and got[2] is not None

    def test_pack_width_guard(self):
        with pytest.raises(ValueError, match="16 bits"):
            pack_subfingerprints(np.ones((3, 20), dtype=bool))
