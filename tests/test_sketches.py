"""Estimator-quality pins for the sketch operators (q66-q68).

The DuckDB oracle proves both engines compute the SAME numbers; these
tests pin that the numbers are GOOD — HLL within its theoretical error,
Bloom with no false negatives, CMS strictly one-sided — so a hash
change that silently degraded an estimator (e.g. the q66 regression
where a chained-affine hash read 811 for 2000 distinct) fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators import sketches as SK
from pandas_analysis_with_postgres_spark.plans.extension_queries import (
    q66_hll_distinct,
    q67_bloom_decontamination,
    q68_cms_heavy_hitters,
)

from .conftest import SF_ORACLE


def test_hll_within_theoretical_error(spark):
    rows = q66_hll_distinct(spark, SF_ORACLE).collect()
    assert len(rows) == 8  # 3 order statuses + 5 event types
    # 1.04/sqrt(256) ≈ 6.5% standard error; allow 2.5 sigma.
    for r in rows:
        assert r.rel_error <= 0.17, (
            f"{r.grp}: HLL {r.hll_estimate:.0f} vs exact {r.exact_distinct} "
            f"({r.rel_error:.1%}) — hash mixing regressed?"
        )


def test_hll_sequential_ids_unbiased(spark):
    # The killer input for a multiply-only hash: dense sequential keys.
    df = spark.range(0, 2000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    est = SK.hll_estimate(SK.hll_registers(df, ["grp"], "v"), ["grp"]).collect()
    assert abs(est[0].hll_estimate - 2000) / 2000 <= 0.17


def test_bloom_one_sided(spark):
    rows = q67_bloom_decontamination(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # No false negatives, ever.
        assert r.bloom_hits >= r.exact_hits, r
        assert r.false_pos_shingles == r.bloom_hits - r.exact_hits
    # The filter must actually filter: aggregate FPR on non-member
    # shingles stays small (2^16 bits over ~3k members → ~0 expected).
    fp = sum(r.false_pos_shingles for r in rows)
    probes = sum(r.n_shingles - r.exact_hits for r in rows)
    assert fp / probes < 0.01, f"bloom FPR {fp}/{probes}"


def test_cms_one_sided_and_within_epsilon(spark):
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table
    from pandas_analysis_with_postgres_spark.functions import text as TX

    rows = q68_cms_heavy_hitters(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.exact_n, r  # one-sided guarantee
    # Published CMS error bound: overcount ≤ (e/w)·N w.h.p., N = total
    # stream items. min-over-d usually lands well under; the bound
    # itself catches a broken (structured) hash, which concentrates
    # collisions and blows far past it.
    n_stream = (
        load_table(spark, SF_ORACLE, "documents")
        .select(
            F.greatest(TX.token_count("text") - 1, F.lit(0)).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    bound = 2.718281828 / 256 * n_stream
    worst = max(r.overcount for r in rows)
    assert worst <= bound, f"CMS overcount {worst} > e/w·N = {bound:.0f}"


class TestApproxProfile:
    """a88's approx=True mode: HLL-backed distinct counts — the
    100 TB-shaped profiler default (round-4 judge ask #6)."""

    def test_no_expand_in_plan_and_schema_stable(self, spark):
        from pandas_analysis_with_postgres_spark.plans.analytics_queries import (
            q88_orders_profile,
        )

        sf = "/root/testdata/sf0.001"
        ap = q88_orders_profile(spark, sf, approx=True)
        plan = ap._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan  # exact mode's |cols|-copy shuffle is gone
        exact = q88_orders_profile(spark, sf)
        assert ap.columns == exact.columns
        # round 12: the exact path is a union of per-column
        # single-distinct aggregates (the oracle's own UNION ALL
        # shape) — no Expand (|cols|-copy row multiplication) in
        # EITHER mode anymore, and each branch's scan prunes to its
        # one column.
        exact_plan = exact._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in exact_plan
        assert "Union" in exact_plan

    def test_estimates_within_hll_error_bound(self, spark):
        from pandas_analysis_with_postgres_spark.plans.analytics_queries import (
            q88_orders_profile,
        )

        sf = "/root/testdata/sf0.01"
        exact = {r.column: r.n_distinct for r in q88_orders_profile(spark, sf).collect()}
        got = {
            r.column: r.n_distinct
            for r in q88_orders_profile(spark, sf, approx=True).collect()
        }
        assert set(got) == set(exact)
        for col, true in exact.items():
            # 256 registers → σ ≈ 6.5%; allow 3σ. Tiny cardinalities hit
            # the linear-counting branch and are near-exact.
            tol = 3 * 0.065 * true if true > 50 else max(1, 0.2 * true)
            assert abs(got[col] - true) <= tol, (col, true, got[col])
        # nulls/min/max/n_rows must be EXACT in approx mode
        e_rows = {r.column: (r.n_rows, r.n_nulls, r.min_repr, r.max_repr)
                  for r in q88_orders_profile(spark, sf).collect()}
        a_rows = {r.column: (r.n_rows, r.n_nulls, r.min_repr, r.max_repr)
                  for r in q88_orders_profile(spark, sf, approx=True).collect()}
        assert e_rows == a_rows


def test_approx_profile_keeps_all_null_columns(spark):
    """Code-review finding: an all-NULL column emits no HLL probes and
    must still profile with n_distinct 0 (left join), matching exact
    mode's output shape."""
    from pandas_analysis_with_postgres_spark.plans import analytics_queries as AQ

    # monkey-patch the profiled column set to include an all-NULL col
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1,), (2,)], "a long").withColumn(
        "b", F.lit(None).cast("long")
    )
    df.createOrReplaceTempView("__null_prof")
    orig_cols, orig_load = AQ.PROFILE_COLS, AQ.load_table
    try:
        AQ.PROFILE_COLS = (("a", "int"), ("b", "int"))
        AQ.load_table = lambda spark, sf, name: spark.table("__null_prof")
        exact = {
            r.column: (r.n_nulls, r.n_distinct)
            for r in AQ.q88_orders_profile(spark, "unused").collect()
        }
        approx = {
            r.column: (r.n_nulls, r.n_distinct)
            for r in AQ.q88_orders_profile(spark, "unused", approx=True).collect()
        }
    finally:
        AQ.PROFILE_COLS, AQ.load_table = orig_cols, orig_load
    assert exact["b"] == (2, 0)
    assert approx["b"] == (2, 0)
    assert set(approx) == {"a", "b"}
