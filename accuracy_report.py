#!/usr/bin/env python
"""Accuracy report — the engine vs the reference's published numbers.

The reference README's accuracy story (``/root/reference/README.md``):
on 2.63M true NDV, Spark's built-in ``approx_count_distinct`` was -7.9%
off while its CPC sketch came within +0.56%; its quantile/freq-items
sections show the same summary-accuracy shape. This script reproduces
those experiments on synthetic data THROUGH THE SPARK SURFACE (the same
functions a user calls) and prints one JSON line per experiment:

* NDV sweep — built-in ``approx_count_distinct`` vs
  ``approx_count_distinct_ex`` (CPC-class engine HLL) vs
  ``approx_count_distinct_theta`` vs Spark's native HLL sketch, at the
  reference-default configs. Pass = `ex` beats the built-in and stays
  within CPC-class error (<1%).
* Quantile rank error — KLL and REQ at reference-default k on a
  lognormal stream: the true rank of each estimated quantile vs the
  requested rank. Pass = REQ's high-rank (p99/p999) error ~0; KLL
  uniform-rank error small.
* Frequent items — a Zipf stream: every reported estimate must bracket
  the true count within the Misra-Gries bound n/maxMapSize.

Scale via ``SPARK_GRAFT_ACC_ROWS`` (default 2,000,000 — ~2 min on
local[8]; the reference's BitcoinHeist experiment is ~2.9M rows).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(spark=None, rows: int | None = None) -> int:
    import datasketches_spark_spark as dss
    from datasketches_spark_spark.sources import session_builder
    from pyspark.sql import functions as F

    rows = rows or int(os.environ.get("SPARK_GRAFT_ACC_ROWS", 2_000_000))
    own_session = spark is None
    if own_session:
        spark = (session_builder(master="local[8]", shuffle_partitions=8)
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "8g")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
    dss.install(spark)
    failures = []

    # ---------------------------------------------------------------- NDV
    # ~70% distinct ids (like address data: most appear once, some repeat)
    ndv_df = spark.range(0, rows, 1, 8).select(
        F.concat(F.lit("addr_"),
                 F.conv(F.abs(F.xxhash64("id")) % int(rows * 0.7), 10, 16)
                 ).alias("address"))
    ndv_df.cache()
    ndv_df.createOrReplaceTempView("acc_addresses")
    # mixed JVM + sketch aggregates in one SQL text — the dss.sql split
    # (plain spark.sql rejects this shape: INVALID_PANDAS_UDF_PLACEMENT)
    (res,) = dss.sql(spark, """
        SELECT count(DISTINCT address) AS true_ndv,
               approx_count_distinct(address) AS builtin,
               approx_count_distinct_ex(address) AS engine_ex,
               approx_count_distinct_theta(address) AS engine_theta,
               hll_sketch_estimate(hll_sketch_agg(address)) AS spark_hll
        FROM acc_addresses
    """).collect()
    true_ndv = res["true_ndv"]
    errs = {k: (res[k] - true_ndv) / true_ndv * 100
            for k in ("builtin", "engine_ex", "engine_theta", "spark_hll")}
    print(json.dumps({
        "experiment": "ndv", "rows": rows, "true_ndv": true_ndv,
        "estimates": {k: int(res[k]) for k in errs},
        "pct_err": {k: round(v, 3) for k, v in errs.items()},
        "reference_target_pct": 0.56,  # README.md CPC at 2.63M NDV
    }))
    # pass criterion is the engine's own CPC-class bound; the built-in
    # comparison is reported data (a single draw of its ~2-3% RSE can get
    # lucky — the reference's -7.9% example is one such draw on its side)
    if abs(errs["engine_ex"]) > 1.0:
        failures.append(f"engine_ex NDV error {errs['engine_ex']:.2f}% > 1%")

    # genuine-CPC accumulate (round 7): the engine's OWN CpcSketch-
    # compatible states at the reference default lgK=11, estimated by
    # ICON and cross-checked by datasketches-java reading the same bytes.
    # CPC RSE at lgK=11 (merged/ICON) is ~1.06/sqrt(2^11) ~ 2.3%; use 3
    # sigma as the gate.
    (cpc_row,) = dss.sql(spark, """
        SELECT approx_count_distinct_estimate(
                 approx_count_distinct_accumulate_cpc(address)) AS engine,
               approx_count_distinct_accumulate_cpc(address) AS state
        FROM acc_addresses""").collect()
    jcpc = spark._jvm.org.apache.datasketches.cpc.CpcSketch
    java_est = jcpc.heapify(bytearray(bytes(cpc_row["state"]))).getEstimate()
    cpc_err = (cpc_row["engine"] - true_ndv) / true_ndv * 100
    print(json.dumps({
        "experiment": "cpc_native_accumulate", "rows": rows,
        "true_ndv": true_ndv, "engine_estimate": int(cpc_row["engine"]),
        "java_reads_same_bytes": round(float(java_est), 1),
        "pct_err": round(cpc_err, 3), "lgk": 11,
        "gate_pct": 7.0,  # 3 x merged-CPC RSE at lgK=11
    }))
    if abs(cpc_err) > 7.0:
        failures.append(f"CPC accumulate NDV error {cpc_err:.2f}% > 7%")
    if abs(java_est - cpc_row["engine"]) > max(1.0, 0.001 * true_ndv):
        failures.append("java disagrees with engine on the same CPC bytes")
    ndv_df.unpersist()

    # ----------------------------------------------------- quantile ranks
    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=rows).astype("float64")
    vals_sorted = np.sort(vals)
    vdf = spark.createDataFrame(
        [(float(x),) for x in vals[:0]], "v double")  # schema only
    # Arrow-efficient load: via pandas in chunks
    import pandas as pd
    vdf = spark.createDataFrame(pd.DataFrame({"v": vals})).repartition(8)
    vdf.cache().count()
    out = {"experiment": "quantile_rank_error", "rows": rows, "impls": {}}
    for impl, fn in (("KLL", "approx_percentile_kll"),
                     ("REQ", "approx_percentile_req")):
        ps = [0.5, 0.9, 0.99, 0.999]
        (row,) = vdf.agg(F.expr(
            f"{fn}_array(v, array({', '.join(map(str, ps))}))")
            .alias("qs")).collect()
        rank_errs = {}
        for p, est in zip(ps, row["qs"]):
            true_rank = np.searchsorted(vals_sorted, est, side="right") / rows
            rank_errs[str(p)] = round(float(true_rank - p), 6)
        out["impls"][impl] = rank_errs
        worst = max(abs(v) for v in rank_errs.values())
        if impl == "REQ":
            hi = max(abs(rank_errs["0.99"]), abs(rank_errs["0.999"]))
            if hi > 0.005:
                failures.append(f"REQ high-rank error {hi} > 0.005")
        elif worst > 0.02:
            failures.append(f"KLL rank error {worst} > 0.02")
    print(json.dumps(out))
    vdf.unpersist()

    # -------------------------------------------------------- freq items
    zipf = np.minimum(rng.zipf(1.3, size=rows), 10_000).astype("int64")
    fdf = spark.createDataFrame(pd.DataFrame({"item": zipf})).repartition(8)
    fdf.cache()
    true_counts = fdf.groupBy("item").count().orderBy(F.desc("count")) \
                     .limit(20).collect()
    true_map = {r["item"]: r["count"] for r in true_counts}
    (row,) = fdf.agg(F.expr("approx_freqitems_long(item)").alias("top")) \
                .collect()
    max_map = 1024  # conf default
    bound = rows / max_map
    reported = {e["item"]: e["estimated"] for e in row["top"]}
    worst_abs = 0
    for item, est in reported.items():
        true = true_map.get(item)
        if true is None:
            continue
        worst_abs = max(worst_abs, abs(est - true))
        if not (true <= est <= true + bound):
            failures.append(
                f"freq item {item}: est {est} outside [true, true+n/m] "
                f"[{true}, {true + bound:.0f}]")
    print(json.dumps({
        "experiment": "freq_items", "rows": rows,
        "reported_items": len(reported),
        "worst_abs_overcount": int(worst_abs),
        "mg_bound_n_over_m": int(bound),
    }))

    # ------------------------------------------------- sampling uniformity
    # The reservoir family's central claim is that the DISTRIBUTED merge
    # tree (per-group accumulate -> hypergeometric combine) is still a
    # uniform sample — a biased merge (e.g. favoring the larger reservoir)
    # would pass size checks but skew every downstream estimate. Test:
    # sample ids 0..rows-1 through an 8-way accumulate -> combine tree,
    # bin the merged sample into 16 equal-width bins, and chi-square the
    # counts against uniform (dof 15, alpha 0.001 -> critical 37.697);
    # also z-test the sample mean. The A-ES weighted family with equal
    # weights must behave identically (weighted-uniform degenerates to
    # uniform).
    from datasketches_spark_spark import functions as dsf
    # k below rows/16 keeps every per-group reservoir (rows/8 items) PAST
    # the exact regime, so the positional accept/replace path and the
    # hypergeometric merge both actually run
    k_res = min(4096, max(512, rows // 16))
    sdf = spark.range(0, rows, 1, 8).select(
        F.col("id").cast("double").alias("v"),
        (F.col("id") % 8).alias("g"))
    sdf.cache().count()
    chi_crit, n_bins = 37.697, 16  # chi2 inv-cdf(0.999, dof=15)
    samp_out = {"experiment": "sampling_uniformity", "rows": rows,
                "k": k_res, "families": {}}
    for fam_name, acc_col in (
            ("reservoir", dsf.approx_sample_accumulate("v", k=k_res)),
            ("weighted_equal_w",
             dsf.approx_sample_weighted_accumulate("v", F.lit(1.0),
                                                   k=k_res))):
        per = sdf.groupBy("g").agg(acc_col.alias("st"))
        (row,) = (per.agg(dsf.approx_sample_combine("st").alias("m"))
                  .select(dsf.approx_sample_estimate("m").alias("sample"),
                          dsf.approx_sample_stream_size("m").alias("n"))
                  .collect())
        if row["n"] != rows:
            failures.append(
                f"{fam_name} merged stream size {row['n']} != {rows}")
        samp = np.asarray(row["sample"], dtype=np.float64)
        k_eff = samp.size
        obs, _ = np.histogram(samp, bins=n_bins, range=(0.0, float(rows)))
        exp = k_eff / n_bins
        chi2 = float(((obs - exp) ** 2 / exp).sum())
        # mean of k uniform draws over [0, rows): sd = rows/sqrt(12k)
        z = float((samp.mean() - rows / 2) / (rows / np.sqrt(12 * k_eff)))
        samp_out["families"][fam_name] = {
            "k_effective": int(k_eff), "chi2_16bins": round(chi2, 2),
            "chi2_crit_p999": chi_crit, "mean_z": round(z, 3)}
        if k_eff < min(k_res, rows):
            failures.append(
                f"{fam_name} retained {k_eff} < min(k, rows)")
        if chi2 > chi_crit:
            failures.append(
                f"{fam_name} merge-tree sample not uniform: chi2 {chi2:.1f}"
                f" > {chi_crit}")
        if abs(z) > 4.0:
            failures.append(
                f"{fam_name} sample mean biased: z {z:.2f}")
    print(json.dumps(samp_out))
    sdf.unpersist()

    # --------------------------------------------- bounds coverage (r7)
    # NDV interval coverage at 2 std devs for Theta (KMV RSE 1/sqrt(k-2))
    # and the engine HLL (1.04/sqrt(2^lgk)); expected ~95%+ per the
    # normal envelope. Pure-python trials through the sketch layer (the
    # Spark UDF applies the identical formulas — pinned by pytest).
    from datasketches_spark_spark.sketches.hll import HllSketch
    from datasketches_spark_spark.sketches.theta import (ThetaSketch,
                                                         hash_longs)
    rng = np.random.default_rng(7)
    trials = 40
    cov = {"theta": 0, "hll": 0}
    for t in range(trials):
        n = 120_000 + 4_000 * t
        vals = rng.integers(0, 2**62, size=n)
        true = len(np.unique(vals))
        th = ThetaSketch(k=4096)
        th.update_hashes(hash_longs(vals))
        rse = 1.0 / np.sqrt(th.k - 2)
        est = th.estimate()
        cov["theta"] += int(est / (1 + 2 * rse) <= true
                            <= est / (1 - 2 * rse))
        hl = HllSketch(lgk=15)
        hl.update_hashes(hash_longs(vals))
        rse = 1.04 / np.sqrt(1 << hl.lgk)
        est = hl.estimate()
        cov["hll"] += int(est / (1 + 2 * rse) <= true
                          <= est / (1 - 2 * rse))
    print(json.dumps({"experiment": "ndv_bounds_coverage",
                      "trials": trials, "num_std": 2,
                      "covered": cov}))
    for fam, c in cov.items():
        if c / trials < 0.9:
            failures.append(
                f"{fam} 2-sigma NDV bounds covered only {c}/{trials}")

    # ------------------------------------- join-size estimation error (r8)
    # q55's exact-regime oracle proves correctness; THIS is the
    # estimation-regime contract: with map size << key NDV, the
    # heavy-hitter approximation sum_k est_A(k)*est_B(k) must stay inside
    # the derivable Misra-Gries envelope
    #   |est - true| <= errA*nB + errB*nA
    # (overcount: each retained estimate exceeds truth by <= err, summed
    # against the other stream's total mass; undercount: every purged key
    # has true count <= err, so the missed cross terms are bounded the
    # same way), with err read back from the sketch itself
    # (approx_freqitems_maxerr's value). Zipf streams make join size
    # heavy-hitter-dominated — the planner use case — so the relative
    # error lands far inside that loose bound; both are reported.
    from datasketches_spark_spark.sketches import FreqItemsSketch

    js_out = {}
    for zipf_s, tag in ((1.3, "zipf1.3"), (1.1, "zipf1.1")):
        n_js = max(rows, 1_000_000)
        keys_a = rng.zipf(zipf_s, size=n_js) % 500_000
        keys_b = (rng.zipf(zipf_s, size=n_js) + 17) % 500_000
        ka, ca = np.unique(keys_a, return_counts=True)
        kb, cb = np.unique(keys_b, return_counts=True)
        common, ia, ib = np.intersect1d(ka, kb, return_indices=True)
        true_js = int(np.dot(ca[ia].astype(np.float64),
                             cb[ib].astype(np.float64)))
        sks = []
        for keys in (keys_a, keys_b):
            # two-chunk build + merge so the MERGE error path is in scope
            halves = []
            for chunk in np.array_split(keys, 2):
                sk = FreqItemsSketch(max_map_size=1024, item_type="long")
                sk.update_batch(chunk)
                halves.append(sk)
            halves[0].merge(halves[1])
            sks.append(halves[0])
        sa, sb = sks
        assert sa._max_err > 0, "not in estimation regime - raise NDV"
        est = sum(sa.estimate(i) * sb.estimate(i) for i in sa._counts)
        bound = sa._max_err * n_js + sb._max_err * n_js
        abs_err = abs(est - true_js)
        js_out[tag] = {"true": true_js, "est": int(est),
                       "rel_err_pct": round(abs_err / true_js * 100, 3),
                       "bound_used_pct": round(abs_err / bound * 100, 2)}
        if abs_err > bound:
            failures.append(
                f"join-size error {abs_err} exceeds MG envelope {bound}"
                f" at {tag}")
    print(json.dumps({"experiment": "join_size_estimation",
                      "map_size": 1024, "results": js_out}))

    # ------------------------------------------------- KS error (r7)
    # |KS(sketch states) - KS(raw)| at small k tracks the KLL rank-error
    # envelope regardless of the true drift magnitude.
    from datasketches_spark_spark.sketches import make_quantile_sketch

    def ks_true(a, b):
        xs = np.union1d(a, b)
        fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        return float(np.max(np.abs(fa - fb)))

    def ks_est(a, b, k):
        sks = []
        for arr in (a, b):
            sk = make_quantile_sketch("MERGEABLE", k, np.float64)
            sk.update_batch(arr)
            sks.append(sk)
        va, wa = sks[0]._weighted_items()
        vb, wb = sks[1]._weighted_items()
        xs = np.union1d(va, vb)

        def ecdf(v, w):
            cum = np.cumsum(w)
            idx = np.searchsorted(v, xs, side="right")
            return np.where(idx > 0, cum[np.maximum(idx - 1, 0)],
                            0) / float(cum[-1])

        return float(np.max(np.abs(ecdf(va, wa) - ecdf(vb, wb))))

    ks_out = {}
    n = 100_000
    for shift in (0.0, 0.3):
        errs = []
        for _ in range(3):
            a = rng.normal(0, 1, n)
            b = rng.normal(shift, 1, n)
            errs.append(abs(ks_est(a, b, 128) - ks_true(a, b)))
        ks_out[f"shift_{shift}"] = round(float(np.max(errs)), 5)
        if max(errs) > 0.08:
            failures.append(
                f"KS estimation error {max(errs):.4f} at shift {shift}"
                " exceeds the k=128 envelope")
    print(json.dumps({"experiment": "ks_distance_error", "k": 128,
                      "max_abs_err_vs_true": ks_out}))

    # ---------------------------------------------- tuple per-key segment
    # the tuple family's ESTIMATION regime (NDV >> k=4096): one state
    # over (address, 1.0) answers NDV, total rows, and the per-key
    # predicate "addresses seen >= 2 times (and their row mass)" — each
    # a Horvitz-Thompson estimate over the KMV key sample, so all gates
    # derive from the KMV RSE 1/sqrt(k-2) ~ 1.56%; 3 sigma < 5%, with a
    # point of slack on the segment legs for per-key-count variance.
    (tup_row,) = dss.sql(spark, """
        SELECT approx_tuple_estimate(
                 approx_tuple_accumulate(address, 1.0)) AS e,
               approx_tuple_segment_estimate(
                 approx_tuple_accumulate(address, 1.0), 2) AS s
        FROM acc_addresses""").collect()
    (tup_truth,) = spark.sql("""
        WITH pk AS (SELECT address, count(*) AS c FROM acc_addresses
                    GROUP BY 1)
        SELECT count(*) AS ndv, sum(c) AS n_rows,
               count(CASE WHEN c >= 2 THEN 1 END) AS rep_keys,
               COALESCE(sum(CASE WHEN c >= 2 THEN c END), 0) AS rep_rows
        FROM pk""").collect()
    tup_errs = {
        "ndv": (tup_row.e.ndv - tup_truth.ndv) / tup_truth.ndv * 100,
        "rows": (tup_row.e.rows - tup_truth.n_rows)
        / tup_truth.n_rows * 100,
        "seg_keys": (tup_row.s.keys - tup_truth.rep_keys)
        / tup_truth.rep_keys * 100,
        "seg_rows": (tup_row.s.value_sum - tup_truth.rep_rows)
        / tup_truth.rep_rows * 100,
    }
    print(json.dumps({
        "experiment": "tuple_segment_estimation", "rows": rows, "k": 4096,
        "true": {"ndv": int(tup_truth.ndv), "rep_keys":
                 int(tup_truth.rep_keys)},
        "estimates": {"ndv": int(tup_row.e.ndv),
                      "seg_keys": int(tup_row.s.keys)},
        "pct_err": {k: round(v, 3) for k, v in tup_errs.items()},
    }))
    if abs(tup_errs["ndv"]) > 5.0:
        failures.append(f"tuple NDV error {tup_errs['ndv']:.2f}% > 5%")
    for leg in ("rows", "seg_keys", "seg_rows"):
        if abs(tup_errs[leg]) > 6.0:
            failures.append(
                f"tuple {leg} error {tup_errs[leg]:.2f}% > 6%")

    # ----------------------------------------- AoD wire at saturation
    # the DataSketches ArrayOfDoubles wire family (round 11,
    # compat/aod.py) past nominal k: the engine's estimate of its OWN
    # wire state sits in the same KMV envelope, and — the interop
    # claim — datasketches-java's estimate of the SAME bytes agrees
    # with the engine's to the rounding unit (proving the saturated
    # state is a VALID AoD image, not just a parseable one).
    (aod_row,) = dss.sql(spark, """
        SELECT approx_tuple_estimate(
                 approx_tuple_accumulate_wire(address, 1.0)) AS e,
               approx_tuple_accumulate_wire(address, 1.0) AS st
        FROM acc_addresses""").collect()
    aod_err = (aod_row.e.ndv - tup_truth.ndv) / tup_truth.ndv * 100
    jsk = (spark._jvm.org.apache.datasketches.tuple.arrayofdoubles
           .ArrayOfDoublesSketches.heapifySketch(
               spark._jvm.org.apache.datasketches.memory.Memory.wrap(
                   bytes(aod_row.st))))
    java_est = float(jsk.getEstimate())
    print(json.dumps({
        "experiment": "aod_wire_estimation", "rows": rows, "k": 4096,
        "true_ndv": int(tup_truth.ndv),
        "engine_est": int(aod_row.e.ndv),
        "java_est_of_same_bytes": round(java_est, 2),
        "pct_err": round(aod_err, 3),
    }))
    if abs(aod_err) > 5.0:
        failures.append(f"AoD wire NDV error {aod_err:.2f}% > 5%")
    if abs(java_est - aod_row.e.ndv) > 1.0:
        failures.append(
            f"datasketches-java disagrees with the engine on the same "
            f"AoD bytes: {java_est} vs {aod_row.e.ndv}")

    # ------------------------------------------- bloom membership (r12)
    # the membership family at its DESIGN point: accumulate ~expected_n
    # distinct keys, then (a) every inserted key tests positive (the
    # no-false-negative contract, checked exhaustively), (b) the
    # observed FP rate on an equal-size disjoint probe set sits within
    # 3x the design fpp, (c) the fill-ratio NDV estimate lands within
    # 2% — the three read-time claims docs/SCALE.md makes.
    n_keys = min(rows, 1_000_000)
    keys = spark.range(n_keys).selectExpr("id AS k")
    keys.createOrReplaceTempView("acc_bloom_keys")
    (b_row,) = dss.sql(spark, """
        SELECT approx_membership_accumulate(k) AS st,
               approx_membership_estimate(
                 approx_membership_accumulate(k)) AS est,
               approx_membership_fpp(
                 approx_membership_accumulate(k)) AS fpp
        FROM acc_bloom_keys""").collect()
    from datasketches_spark_spark.functions.udfs import (
        bloom_contains_broadcast_udf)
    bc = spark.sparkContext.broadcast(bytes(b_row.st))
    probe = bloom_contains_broadcast_udf(bc)
    fn = keys.where(~probe(F.col("k"))).count()
    fp = keys.where(probe(F.col("k") + 2 * n_keys)).count()
    design_fpp = 0.01  # conf default sizes for 1M expected keys
    fp_rate = fp / n_keys
    ndv_err = (b_row.est - n_keys) / n_keys * 100
    print(json.dumps({
        "experiment": "bloom_membership", "keys": n_keys,
        "false_negatives": int(fn),
        "fp_rate_observed": round(fp_rate, 6),
        "fpp_decoded": round(float(b_row.fpp), 6),
        "ndv_pct_err": round(ndv_err, 3),
    }))
    if fn:
        failures.append(f"bloom false negatives: {fn}")
    if fp_rate > 3 * design_fpp:
        failures.append(
            f"bloom FP rate {fp_rate:.4f} > 3x design {design_fpp}")
    if abs(ndv_err) > 2.0:
        failures.append(f"bloom NDV error {ndv_err:.2f}% > 2%")

    print(json.dumps({"experiment": "summary",
                      "failures": failures or None}))
    if own_session:
        spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
