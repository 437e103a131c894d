"""Engine configuration — same key surface as the reference.

The reference defines 8 SQLConf entries (``DataSketchConf.scala:36-92``).
This engine reads the same keys from the active ``SparkSession`` conf (or
accepts explicit keyword overrides on every function).

Divergences (documented per SURVEY.md §7 risk register):

* ``quantiles.sketchImpl``: reference values KLL/REQ/MERGEABLE select three
  DataSketches algorithms. Here KLL and REQ are the engine's own
  implementations (``sketches/kll.py``, ``sketches/req.py`` — REQ is a real
  relative-error sketch with high-rank accuracy, the reference's default);
  MERGEABLE runs the KLL core over float64 (the reference's DoublesSketch
  is double-typed, ``quantileSketches.scala:124-127``).
* ``distinctCnt.sketchImpl``: reference values CPC/HLL. Here CPC is served
  by a KMV Theta sketch (``sketches/theta.py``) and HLL by Spark's native
  ``hll_sketch_agg`` family. ``THETA`` is accepted as an explicit value.
* ``approx_count_distinct_hll`` really runs HLL here (the reference
  mislabels it and runs CPC, ``distinctCntSketches.scala:249`` — we
  implement the documented behavior, not the bug).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_PREFIX = "spark.sql.dataSketches"

QUANTILE_IMPL_KEY = f"{_PREFIX}.quantiles.sketchImpl"
QUANTILE_KLL_K_KEY = f"{_PREFIX}.quantiles.kll.k"
QUANTILE_REQ_K_KEY = f"{_PREFIX}.quantiles.req.k"
QUANTILE_MERGEABLE_K_KEY = f"{_PREFIX}.quantiles.mergeable.k"
FREQ_MAX_MAP_SIZE_KEY = f"{_PREFIX}.freqItems.maxMapSize"
DISTINCT_IMPL_KEY = f"{_PREFIX}.distinctCnt.sketchImpl"
DISTINCT_CPC_LGK_KEY = f"{_PREFIX}.distinctCnt.cpc.lgK"
DISTINCT_HLL_LGK_KEY = f"{_PREFIX}.distinctCnt.hll.lgK"
SAMPLE_RESERVOIR_K_KEY = f"{_PREFIX}.sampling.reservoir.k"
QUANTILE_RANK_RULE_KEY = f"{_PREFIX}.quantiles.rankRule"
TUPLE_K_KEY = f"{_PREFIX}.tuple.k"
MEMBERSHIP_EXPECTED_KEY = f"{_PREFIX}.membership.expectedItems"
MEMBERSHIP_FPP_KEY = f"{_PREFIX}.membership.fpp"

DEFAULTS = {
    QUANTILE_IMPL_KEY: "REQ",          # DataSketchConf.scala:36-41
    QUANTILE_KLL_K_KEY: "200",         # :43-48
    QUANTILE_REQ_K_KEY: "12",          # :50-55
    QUANTILE_MERGEABLE_K_KEY: "128",   # :57-62
    FREQ_MAX_MAP_SIZE_KEY: "1024",     # :64-71
    DISTINCT_IMPL_KEY: "CPC",          # :73-78
    DISTINCT_CPC_LGK_KEY: "11",        # :80-85
    DISTINCT_HLL_LGK_KEY: "12",        # :87-92
    SAMPLE_RESERVOIR_K_KEY: "1024",    # extension (no reference analogue)
    TUPLE_K_KEY: "4096",               # extension: tuple-sketch entries
    # extension: Bloom membership design point — geometry is derived
    # from (expectedItems, fpp) at accumulate time, so partials merge
    MEMBERSHIP_EXPECTED_KEY: "1000000",
    MEMBERSHIP_FPP_KEY: "0.01",
    # "disc" = SQL quantile_disc (engine contract, DuckDB-oracle-checked);
    # "exclusive" = DataSketches v2 getQuantile rule the reference
    # inherits (its suite pins p50 of {0,1,2,10} = 2,
    # ApproximateQuerySuite.scala:32-49) — set it to reproduce reference
    # answers bit-for-bit when migrating.
    QUANTILE_RANK_RULE_KEY: "disc",
}

QUANTILE_IMPLS = ("KLL", "REQ", "MERGEABLE")
DISTINCT_IMPLS = ("CPC", "THETA", "HLL")


def _spark() -> SparkSession | None:
    return SparkSession.getActiveSession()


def get_conf(key: str, spark: SparkSession | None = None) -> str:
    spark = spark or _spark()
    default = DEFAULTS[key]
    if spark is None:
        return default
    return spark.conf.get(key, default)


def quantile_impl(spark=None) -> str:
    v = get_conf(QUANTILE_IMPL_KEY, spark).upper()
    if v not in QUANTILE_IMPLS:
        raise ValueError(
            f"{QUANTILE_IMPL_KEY} must be one of {QUANTILE_IMPLS}, got {v}")
    return v


def quantile_k(impl: str, spark=None) -> int:
    key = {
        "KLL": QUANTILE_KLL_K_KEY,
        "REQ": QUANTILE_REQ_K_KEY,
        "MERGEABLE": QUANTILE_MERGEABLE_K_KEY,
    }[impl]
    return int(get_conf(key, spark))


def freq_max_map_size(spark=None) -> int:
    v = int(get_conf(FREQ_MAX_MAP_SIZE_KEY, spark))
    if v <= 0 or (v & (v - 1)) != 0:
        raise ValueError(f"{FREQ_MAX_MAP_SIZE_KEY} must be a positive power of 2")
    return v


def distinct_impl(spark=None) -> str:
    v = get_conf(DISTINCT_IMPL_KEY, spark).upper()
    if v not in DISTINCT_IMPLS:
        raise ValueError(
            f"{DISTINCT_IMPL_KEY} must be one of {DISTINCT_IMPLS}, got {v}")
    return v


def distinct_theta_k(spark=None) -> int:
    # CPC lgK=11 has RSE ~0.6%; KMV needs more entries for similar RSE.
    # Use 2**(lgK+1) nominal entries (k=4096 at the default lgK=11).
    return 1 << (int(get_conf(DISTINCT_CPC_LGK_KEY, spark)) + 1)


def distinct_hll_lgk(spark=None) -> int:
    return int(get_conf(DISTINCT_HLL_LGK_KEY, spark))


def quantile_rank_rule(spark=None) -> str:
    v = get_conf(QUANTILE_RANK_RULE_KEY, spark).lower()
    if v not in ("disc", "exclusive"):
        raise ValueError(
            f"{QUANTILE_RANK_RULE_KEY} must be 'disc' or 'exclusive', got {v}")
    return v


def sample_reservoir_k(spark=None) -> int:
    v = int(get_conf(SAMPLE_RESERVOIR_K_KEY, spark))
    if v <= 0:
        raise ValueError(f"{SAMPLE_RESERVOIR_K_KEY} must be positive")
    return v


def tuple_k(spark=None) -> int:
    """Retained distinct-key entries of the tuple (per-key summary)
    sketch — same KMV accuracy class as Theta at the same k."""
    v = int(get_conf(TUPLE_K_KEY, spark))
    if v < 16:
        raise ValueError(f"{TUPLE_K_KEY} must be >= 16")
    return v


def membership_expected(spark=None) -> int:
    """Design distinct-key capacity of the Bloom membership filter."""
    v = int(get_conf(MEMBERSHIP_EXPECTED_KEY, spark))
    if v < 1:
        raise ValueError(f"{MEMBERSHIP_EXPECTED_KEY} must be >= 1")
    return v


def membership_fpp(spark=None) -> float:
    """Design false-positive probability of the Bloom membership filter."""
    v = float(get_conf(MEMBERSHIP_FPP_KEY, spark))
    if not 0.0 < v < 1.0:
        raise ValueError(f"{MEMBERSHIP_FPP_KEY} must be in (0, 1)")
    return v


def distinct_cpc_wire_lgk(spark=None) -> int:
    """The RAW CPC lgK (reference conf ``distinctCnt.cpc.lgK``, default
    11) for the genuine-CPC accumulate path — states in the Apache
    DataSketches CPC wire format, byte-compatible with the reference."""
    v = int(get_conf(DISTINCT_CPC_LGK_KEY, spark))
    if not 4 <= v <= 26:
        raise ValueError(f"{DISTINCT_CPC_LGK_KEY} must be in [4, 26]")
    return v


def distinct_cpc_lgk(spark=None) -> int:
    """lgk for the engine HLL that serves the CPC name: CPC at lgK has
    RSE ~ 0.59/sqrt(2^lgK); plain HLL needs ~4x the registers for the same
    error (1.04/sqrt(m)), so lgk = cpc_lgK + 4 meets CPC-class accuracy
    (reference default lgK=11 -> lgk=15 -> RSE ~ 0.57%, on par with the
    reference's published +0.56%, ``README.md:259-264``). The sketch's
    sparse phase keeps small-NDV groups exact and small on the wire."""
    lgk = int(get_conf(DISTINCT_CPC_LGK_KEY, spark)) + 4
    return max(12, min(20, lgk))
