"""Warehouse-analytics extension queries (q73-q81): chunking, rolling
range-frame windows, outlier scoring, pivot/unpivot, skew profiling,
deterministic sampling, grouped percentiles, decile ranking.

These widen the declared API surface beyond SURVEY §2's reference
parity set: every shape here is a standard large-corpus / warehouse
pattern (RAG chunk prep, rolling features, wide-format exports, shuffle
diagnostics) expressed as pure Catalyst plans — no UDFs, no driver
materialization.

Determinism strategy (same contract as extension_queries): every
reduction that the oracle hash-compares is either integer-exact
(BIGINT sums of decimal-quantized cents) or an IEEE expression mirrored
operand-for-operand in the DuckDB SQL, so doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table

# ---------------------------------------------------------------------
# q73 — document chunking (RAG / embedding prep).
# ---------------------------------------------------------------------

#: Fixed-size overlapping character chunks: 200-char windows on a
#: 150-char stride (50-char overlap), the classic RAG pre-embedding
#: split. Token-budget packing is the sibling operator (q63).
CHUNK_LEN = 200
CHUNK_STRIDE = 150


def q73_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode each document into overlapping character chunks.

    ``sequence(1, len, stride)`` builds the start offsets in-plan and
    ``posexplode`` fans them out — one narrow projection, no shuffle at
    all: chunking is embarrassingly parallel and stays that way at
    100 TB (cost scales with output bytes, not document count).
    Reference analog: none (extension surface).
    """
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.substring(F.col("text"), F.col("chunk_start"), CHUNK_LEN)
    return (
        docs.select(
            "doc_id", "text", F.posexplode(starts).alias("pos", "chunk_start")
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            chunk.alias("chunk_text"),
            F.length(chunk).cast("long").alias("chunk_len"),
        )
    )


Q73_SQL = f"""
SELECT doc_id,
       CAST((g - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(g AS BIGINT) AS chunk_start,
       substring(text, g, {CHUNK_LEN}) AS chunk_text,
       CAST(length(substring(text, g, {CHUNK_LEN})) AS BIGINT) AS chunk_len
FROM documents,
     LATERAL unnest(generate_series(1, greatest(length(text), 1), {CHUNK_STRIDE})) AS t(g)
"""


# ---------------------------------------------------------------------
# q74 — rolling 7-day spend per customer (RANGE-frame window).
# ---------------------------------------------------------------------


def q74_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing spend/order-count per customer per order.

    RANGE frame over epoch seconds — the frame is defined by *values*
    (ts - 604800), not row offsets, so tied timestamps all enter the
    frame together and the BIGINT cent sum is order-free → exactly
    reproducible. One shuffle on o_custkey; frames are evaluated with a
    sliding pointer per partition (O(n) per customer, not O(n·frame)).
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    secs = F.unix_timestamp(F.col("o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(secs)
        .rangeBetween(-604800, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        secs.alias("order_s"),
        F.sum(cents).over(w).alias("spend_7d_cents"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    )


Q74_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_s,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w AS BIGINT)
         AS spend_7d_cents,
       COUNT(*) OVER w AS n_orders_7d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------
# q75 — grouped z-score outlier flags (integer-exact moments).
# ---------------------------------------------------------------------


def q75_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose value is >3σ from its event_type mean.

    The moments are BIGINT sums of floor(value·100) — order-free and
    exact — so mean/variance/z are single deterministic IEEE
    expressions over exact integers, mirrored operand-for-operand in
    the oracle. Stats frame is 5 rows → broadcast join back; the only
    shuffle is the 5-group partial agg.
    """
    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    with_c = events.select("event_id", "event_type", cents.alias("cents"))
    stats = with_c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_c"),
        F.sum(F.col("cents") * F.col("cents")).alias("sumsq_c"),
    )
    mean = F.col("sum_c").cast("double") / F.col("n")
    var = F.greatest(
        F.col("sumsq_c").cast("double") / F.col("n") - mean * mean, F.lit(1e-12)
    )
    z = (F.col("cents").cast("double") - mean) / F.sqrt(var)
    return (
        with_c.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "cents",
            z.alias("z"),
            (F.abs(z) > 3.0).alias("is_outlier"),
        )
    )


Q75_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_c,
         CAST(SUM(cents * cents) AS BIGINT) AS sumsq_c
  FROM c GROUP BY event_type
)
SELECT event_id, c.event_type, cents,
       (CAST(cents AS DOUBLE) - CAST(sum_c AS DOUBLE) / n)
         / sqrt(greatest(CAST(sumsq_c AS DOUBLE) / n
                         - (CAST(sum_c AS DOUBLE) / n) * (CAST(sum_c AS DOUBLE) / n),
                         1e-12)) AS z,
       abs((CAST(cents AS DOUBLE) - CAST(sum_c AS DOUBLE) / n)
           / sqrt(greatest(CAST(sumsq_c AS DOUBLE) / n
                           - (CAST(sum_c AS DOUBLE) / n) * (CAST(sum_c AS DOUBLE) / n),
                           1e-12))) > 3.0 AS is_outlier
FROM c JOIN s ON c.event_type = s.event_type
"""


# ---------------------------------------------------------------------
# q76 — pivot to wide per-user event counts.
# ---------------------------------------------------------------------

#: Explicit pivot domain: keeps the plan fully static (no extra
#: distinct-collection job on the driver) — mandatory at scale.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q76_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() wide table: one row per user, one count column
    per event type. With the value list supplied, this is a single
    hash aggregate on user_id — same cost as a plain groupBy."""
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


Q76_SQL = "SELECT user_id, " + ", ".join(
    f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in EVENT_TYPES
) + " FROM events GROUP BY user_id"


# ---------------------------------------------------------------------
# q77 — unpivot (melt) + per-metric profile.
# ---------------------------------------------------------------------

MELT_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q77_lineitem_melt_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot four measure columns to long form, then profile each
    metric (count/min/max/exact sum). The melt is a zero-shuffle
    projection (Expand node); the profile is a 4-group aggregate.
    Sum goes through decimal(18,2) so it is order-free exact."""
    li = load_table(spark, sf_dir, "lineitem")
    long_form = li.unpivot(
        ["l_orderkey"], list(MELT_COLS), "metric", "val"
    )
    return long_form.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("sum_val"),
    )


Q77_SQL = (
    "SELECT metric, COUNT(*) AS n, MIN(val) AS min_val, MAX(val) AS max_val, "
    "CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val FROM ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS metric, {c} AS val FROM lineitem" for c in MELT_COLS
    )
    + ") t GROUP BY metric"
)


# ---------------------------------------------------------------------
# q78 — key-skew profiler (shuffle-planning diagnostic).
# ---------------------------------------------------------------------


def q78_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of rows-per-key for orders.o_custkey: how skewed is
    the join/agg key? Two cheap aggregates; the output is the exact
    frequency-of-frequencies table a planner needs to choose between
    plain shuffle, AQE skew handling, and salting."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("rows_per_key")
    )
    return per_key.groupBy("rows_per_key").agg(
        F.count(F.lit(1)).alias("n_keys")
    )


Q78_SQL = """
SELECT rows_per_key, COUNT(*) AS n_keys FROM (
  SELECT o_custkey, COUNT(*) AS rows_per_key FROM orders GROUP BY o_custkey
) t GROUP BY rows_per_key
"""


# ---------------------------------------------------------------------
# q79 — deterministic per-source top-k sample.
# ---------------------------------------------------------------------

SAMPLE_K = 20
#: Knuth multiplicative constant; doc_id < 2^21 at every SF here, so
#: the product stays far below 2^63 (and both operands are
#: non-negative, so SQL % == Spark pmod).
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1000003


def q79_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k documents per source, selected by hash order — a stable,
    re-runnable sample (same rows under appends that don't change the
    selected hashes; no RNG). One shuffle on source; row_number's
    sort is bounded per group. Sibling of q62's rate-based mixing:
    this one guarantees exact per-group counts."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(SAMPLE_MULT), F.lit(SAMPLE_MOD))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select(
            "doc_id", "source", h.alias("sample_order"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= SAMPLE_K)
    )


Q79_SQL = f"""
SELECT doc_id, source, sample_order, rn FROM (
  SELECT doc_id, source,
         (doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD} AS sample_order,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD}, doc_id
         ) AS BIGINT) AS rn
  FROM documents
) t WHERE rn <= {SAMPLE_K}
"""


# ---------------------------------------------------------------------
# q80 — grouped exact percentiles (median / quartiles).
# ---------------------------------------------------------------------


def q80_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quartiles of order price per priority.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both compute
    lower + (pos - floor(pos))·(upper - lower) at pos = p·(n-1) — the
    doubles are bit-identical on exact cent inputs. Exact percentile
    is a per-group sort; for 100 TB pre-aggregate to a value→count
    histogram first (prices are 2-decimal: bounded domain) or switch
    to approx_percentile when the contract allows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    base = orders.select("o_orderpriority", cents)
    return base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("cents"), F.lit(0.25)).alias("p25"),
        F.percentile(F.col("cents"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("cents"), F.lit(0.75)).alias("p75"),
    )


Q80_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       quantile_cont(cents, 0.25) AS p25,
       quantile_cont(cents, 0.5)  AS p50,
       quantile_cont(cents, 0.75) AS p75
FROM (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
) t GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------
# q81 — per-segment spend deciles (ntile + cume_dist).
# ---------------------------------------------------------------------


def q81_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank customers into spend deciles within their market segment.

    Partitioning by segment keeps every window partition bounded (a
    global ntile would funnel all rows through one task — the reason
    this query deliberately ranks within segments). Total order via
    (spend_cents, custkey) so ntile/cume_dist are tie-free and
    deterministic; cume_dist = rank/partition-rows is the same IEEE
    division in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    spend = (
        orders.select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("spend_cents"))
    )
    joined = spend.join(
        customer.select("c_custkey", "c_mktsegment"),
        spend.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend_cents").asc(), F.col("o_custkey").asc()
    )
    return joined.select(
        F.col("o_custkey").alias("custkey"),
        "c_mktsegment",
        "spend_cents",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.cume_dist().over(w).alias("cd"),
    )


Q81_SQL = """
SELECT o_custkey AS custkey, c_mktsegment, spend_cents,
       CAST(NTILE(10) OVER w AS BIGINT) AS decile,
       CUME_DIST() OVER w AS cd
FROM (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey
) s JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend_cents, o_custkey)
"""


# ---------------------------------------------------------------------
# q82 — session funnel (click → purchase conversion).
# ---------------------------------------------------------------------


def q82_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session click→purchase funnel, aggregated corpus-wide.

    Builds on q19's sessionization (lag + running sum of session
    starts), then two window passes over the same (user_id) partition —
    Catalyst collapses them into ONE shuffle + one sort since all
    windows share the partitioning. A purchase converts a session only
    if it happens at-or-after the session's first click. Counts are
    integers; the single conversion ratio mirrors operand order."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id", "event_type", F.unix_timestamp(F.col("ts")).alias("s"), "event_id"
    )
    s = F.col("s")
    w_ord = Window.partitionBy("user_id").orderBy(s, "event_id")
    prev = F.lag(s).over(w_ord)
    new_s = F.when(prev.isNull() | ((s - prev) > 1800), 1).otherwise(0)
    sess = base.withColumn("session_id", F.sum(new_s).over(w_ord))
    w_sess = Window.partitionBy("user_id", "session_id")
    first_click = F.min(
        F.when(F.col("event_type") == "click", F.col("s"))
    ).over(w_sess)
    flagged = sess.select(
        "user_id",
        "session_id",
        first_click.alias("first_click_s"),
        (
            (F.col("event_type") == "purchase")
            & first_click.isNotNull()
            & (F.col("s") >= first_click)
        ).alias("converted_row"),
    )
    per_session = flagged.groupBy("user_id", "session_id").agg(
        F.max(F.col("first_click_s").isNotNull()).alias("has_click"),
        F.max("converted_row").alias("converted"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("has_click").cast("long")).alias("n_click_sessions"),
        F.sum(F.col("converted").cast("long")).alias("n_converted"),
        (
            F.sum(F.col("converted").cast("long")).cast("double")
            / F.sum(F.col("has_click").cast("long"))
        ).alias("conversion_rate"),
    )


Q82_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_s IS NULL OR (s - prev_s) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM (SELECT *, LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS prev_s FROM e) t
), sess AS (
  SELECT user_id, event_type, s,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), flagged AS (
  SELECT user_id, session_id,
         MIN(CASE WHEN event_type = 'click' THEN s END)
           OVER (PARTITION BY user_id, session_id) AS first_click_s,
         event_type, s
  FROM sess
), per_session AS (
  SELECT user_id, session_id,
         MAX(first_click_s IS NOT NULL) AS has_click,
         MAX(event_type = 'purchase' AND first_click_s IS NOT NULL
             AND s >= first_click_s) AS converted
  FROM flagged GROUP BY user_id, session_id
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN has_click THEN 1 ELSE 0 END) AS BIGINT) AS n_click_sessions,
       CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         / CAST(SUM(CASE WHEN has_click THEN 1 ELSE 0 END) AS BIGINT) AS conversion_rate
FROM per_session
"""


# ---------------------------------------------------------------------
# q83 — retention cohorts (first-seen day × day offset).
# ---------------------------------------------------------------------


def q83_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle: users grouped by first-active
    day, counted on each subsequent active day offset. Two aggregates
    (user×day distinct, then cohort×offset count) — both map-side
    combinable; the per-user min is a window over the same user
    partitioning the distinct already shuffled on."""
    events = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    user_days = (
        events.select("user_id", day.alias("day"))
        .distinct()
    )
    cohort = user_days.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return (
        cohort.groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


Q83_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
  FROM events
), cohort AS (
  SELECT user_id, day,
         MIN(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM user_days
)
SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_users
FROM cohort GROUP BY cohort_day, day - cohort_day
"""


# ---------------------------------------------------------------------
# q84 — ordered event-sequence extraction (sorted array_agg).
# ---------------------------------------------------------------------

SEQ_K = 5


def q84_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-K event-type sequence per user as a '>'-joined string.

    ``collect_list`` has no ordering contract, so the sort key rides
    inside the struct and ``array_sort`` orders after collection —
    the distributed form of ORDER BY inside an aggregate. Keyed by
    (epoch_micros, event_id): total order, so both engines emit the
    identical sequence."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    arr = F.array_sort(
        F.collect_list(F.struct(us.alias("us"), F.col("event_id").alias("eid"),
                                F.col("event_type").alias("et")))
    )
    seq = F.slice(F.transform(arr, lambda x: x.et), 1, SEQ_K)
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(">", seq).alias("first_events"),
        )
    )


Q84_SQL = f"""
SELECT user_id, COUNT(*) AS n_events,
       array_to_string(list_slice(
         list(event_type ORDER BY epoch_us(ts), event_id), 1, {SEQ_K}), '>')
         AS first_events
FROM events GROUP BY user_id
"""


ANALYTICS_QUERIES = {
    "q73_doc_chunks": q73_doc_chunks,
    "q74_rolling_spend": q74_rolling_spend,
    "q75_value_outliers": q75_value_outliers,
    "q76_event_pivot": q76_event_pivot,
    "q77_lineitem_melt_profile": q77_lineitem_melt_profile,
    "q78_key_skew_profile": q78_key_skew_profile,
    "q79_source_sample": q79_source_sample,
    "q80_price_quartiles": q80_price_quartiles,
    "q81_spend_deciles": q81_spend_deciles,
    "q82_session_funnel": q82_session_funnel,
    "q83_retention_cohorts": q83_retention_cohorts,
    "q84_event_sequences": q84_event_sequences,
}

ANALYTICS_ORACLES = {
    "q73_doc_chunks": Q73_SQL,
    "q74_rolling_spend": Q74_SQL,
    "q75_value_outliers": Q75_SQL,
    "q76_event_pivot": Q76_SQL,
    "q77_lineitem_melt_profile": Q77_SQL,
    "q78_key_skew_profile": Q78_SQL,
    "q79_source_sample": Q79_SQL,
    "q80_price_quartiles": Q80_SQL,
    "q81_spend_deciles": Q81_SQL,
    "q82_session_funnel": Q82_SQL,
    "q83_retention_cohorts": Q83_SQL,
    "q84_event_sequences": Q84_SQL,
}
