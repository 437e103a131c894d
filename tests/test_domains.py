"""Domain-level curation operators (operators/domains.py): stats,
drop rules, broadcast filtering, per-domain caps."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators import (
    cap_per_domain,
    domain_drop_list,
    domain_stats,
    filter_by_domain,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # domain a: 4 clean unique docs
    for i in range(4):
        rows.append((i, " ".join(f"word{j}" for j in range(50)) + f" {i}",
                     "a"))
    # domain b: 2 docs, byte-identical (a mirror)
    for i in range(2):
        rows.append((10 + i, " ".join("dup" for _ in range(60)), "b"))
    # domain c: 3 docs failing quality (too short)
    for i in range(3):
        rows.append((20 + i, f"short text {i}", "c"))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


class TestDomainStats:
    def test_stats_values(self, corpus):
        s = {r.domain: r for r in
             domain_stats(corpus, "source", "doc_id", "text").collect()}
        assert s["a"].n_docs == 4 and s["a"].n_unique == 4
        assert s["a"].dup_frac == 0.0 and s["a"].pass_frac == 1.0
        assert s["b"].n_docs == 2 and s["b"].n_unique == 1
        assert s["b"].dup_frac == 0.5
        assert s["c"].pass_frac == 0.0  # 3-word docs fail min 40
        assert s["a"].n_tokens == 4 * 51

    def test_one_shuffle_plan(self, corpus):
        out = domain_stats(corpus, "source", "doc_id", "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one scan, one exchange for the groupBy (plus AQE wrappers).
        # NOTE the exact-mode exchange is keyed on (domain, _fp) — the
        # countDistinct expansion — so its VOLUME is fingerprint-
        # bounded (the r12 verdict finding); the domain-bounded plan is
        # the sketch mode, pinned below.
        assert plan.count("Exchange") <= 2  # partial+final never rescan

    @pytest.mark.parametrize("mode", ["theta", "hll"])
    def test_sketch_ndv_matches_exact_in_exact_regime(self, corpus, mode):
        exact = {r.domain: r for r in
                 domain_stats(corpus, "source", "doc_id",
                              "text").collect()}
        est = {r.domain: r for r in
               domain_stats(corpus, "source", "doc_id", "text",
                            ndv=mode).collect()}
        assert set(exact) == set(est)
        for d in exact:
            a, b = exact[d], est[d]
            # per-domain NDV << sketch size -> the estimate IS exact,
            # and every non-NDV column is exact by construction
            assert (a.n_docs, a.n_unique, a.n_tokens) == \
                (b.n_docs, b.n_unique, b.n_tokens), d
            assert a.dup_frac == b.dup_frac and a.pass_frac == b.pass_frac

    def test_sketch_ndv_layout_invariant(self, corpus):
        base = domain_stats(corpus, "source", "doc_id", "text",
                            ndv="theta").collect()
        moved = domain_stats(corpus.repartition(16), "source", "doc_id",
                             "text", ndv="theta").collect()
        key = lambda rows: sorted(  # noqa: E731
            (r.domain, r.n_docs, r.n_unique, r.n_tokens) for r in rows)
        assert key(base) == key(moved)

    def test_sketch_ndv_exchange_carries_states(self, corpus):
        """The scale claim, pinned on the plan: sketch mode has ONE
        exchange, placed ABOVE the partial mapInPandas (so it ships
        per-partition-per-domain rows whose payload includes the binary
        NDV state), and no countDistinct expansion anywhere."""
        out = domain_stats(corpus, "source", "doc_id", "text",
                           ndv="theta")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "count(distinct" not in plan.lower()
        # the exchange input is the partial's output schema: the
        # binary state column must be present below the exchange
        ex_pos = plan.index("Exchange")
        below = plan[ex_pos:]
        assert "MapInPandas" in below and "_pstate" in below
        # and the final merge (FlatMapGroupsInPandas) sits above it
        assert "FlatMapGroupsInPandas" in plan[:ex_pos] or \
            "FlatMapGroupsInPandas" in plan

    def test_sketch_ndv_unknown_mode_raises(self, corpus):
        with pytest.raises(ValueError, match="ndv mode"):
            domain_stats(corpus, "source", "doc_id", "text",
                         ndv="bogus").collect()

    def test_drop_rules_precedence(self, corpus):
        stats = domain_stats(corpus, "source", "doc_id", "text")
        drops = {r.domain: r.reason for r in domain_drop_list(
            stats, blocklist=("b",), max_dup_frac=0.25,
            min_pass_frac=0.5).collect()}
        assert drops == {"b": "blocklist", "c": "quality"}

    def test_filter_is_broadcast_antijoin(self, corpus):
        stats = domain_stats(corpus, "source", "doc_id", "text")
        drops = domain_drop_list(stats, blocklist=("b",))
        kept = filter_by_domain(corpus, "source", drops)
        assert sorted(r.doc_id for r in kept.collect()) == \
            [0, 1, 2, 3, 20, 21, 22]
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestCapPerDomain:
    def test_cap_deterministic(self, corpus):
        capped = cap_per_domain(corpus, "source", 2,
                                [F.col("doc_id").desc()])
        got = sorted(r.doc_id for r in capped.collect())
        assert got == [2, 3, 10, 11, 21, 22]  # top-2 ids per domain
        # layout perturbation must not change the kept set
        again = sorted(r.doc_id for r in cap_per_domain(
            corpus.repartition(16), "source", 2,
            [F.col("doc_id").desc()]).collect())
        assert again == got

    def test_cap_validates(self, corpus):
        with pytest.raises(ValueError):
            cap_per_domain(corpus, "source", 0, ["doc_id"])
