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
from .timeutil import epoch_micros, epoch_seconds

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
    secs = epoch_seconds(F.col("o_orderdate"))
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
        "user_id", "event_type", epoch_seconds(F.col("ts")).alias("s"), "event_id"
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
    us = epoch_micros(F.col("ts"))
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


# ---------------------------------------------------------------------
# q86 — PageRank over the part↔supplier bipartite graph.
# ---------------------------------------------------------------------


def q86_supply_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (operators.graph) on the undirected
    part↔supplier edges observed in lineitem: which parts/suppliers sit
    at the densest crossroads of the supply network. Vertex ids encode
    the bipartition (part→2k, supplier→2k+1) so the graph stays a pure
    BIGINT edge list. The oracle unrolls the same 3 integer rounds."""
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    ranks = pagerank(edges)
    return ranks.select(
        "v",
        F.when(F.col("v") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        "rank",
    )


def _pagerank_oracle() -> str:
    from ..operators.graph import (
        PAGERANK_DAMP_PCT,
        PAGERANK_ROUNDS,
        PAGERANK_SCALE,
    )

    base = (PAGERANK_SCALE * (100 - PAGERANK_DAMP_PCT)) // 100
    ctes = [
        """edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
    UNION
    SELECT DISTINCT l_suppkey * 2 + 1, l_partkey * 2 FROM lineitem) u)""",
        "deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT v, CAST({PAGERANK_SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    for r in range(1, PAGERANK_ROUNDS + 1):
        ctes.append(
            f"""r{r} AS MATERIALIZED (
  SELECT e.dst AS v,
         CAST({base} + ({PAGERANK_DAMP_PCT} * SUM(p.rank // d.outdeg)) // 100 AS BIGINT) AS rank
  FROM edges e
  JOIN r{r - 1} p ON e.src = p.v
  JOIN deg d ON d.v = e.src
  GROUP BY e.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v, CASE WHEN v % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind, rank
FROM r{PAGERANK_ROUNDS}
"""
    )


Q86_SQL = _pagerank_oracle()


# ---------------------------------------------------------------------
# q87 — Markov transition matrix over event streams.
# ---------------------------------------------------------------------


def q87_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts + probabilities (the
    first-order Markov model of user behavior). lag over the same
    (user, time) order q19/q82 use, then one small groupBy; the
    probability is one mirrored IEEE division over exact counts."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        epoch_micros(F.col("ts")), "event_id"
    )
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(total)).alias("p"),
    )


Q87_SQL = """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
FROM counts
"""


# ---------------------------------------------------------------------
# q88 — table profiler (per-column null/distinct/min/max).
# ---------------------------------------------------------------------

#: (column, repr kind): ints print as-is, doubles as exact cents,
#: strings as themselves — every repr is deterministic text in both
#: engines (raw double→string formatting is not, so it is never used).
PROFILE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderpriority", "str"),
)


def q88_orders_profile(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """Data profile of orders: per column, null count, distinct count,
    min/max (canonical text repr).

    ``approx=False`` (the oracled path): one single-distinct aggregate
    PER COLUMN, unioned — the same shape as the oracle's UNION ALL.
    The previous all-in-one aggregate forced Catalyst's Expand
    (|cols|+1 copies of every row) into a SORT-based aggregation (the
    string-typed min/max buffers disqualify HashAggregate), a 6-key
    sort of the expanded table; per-column plans each scan ONE pruned
    column, hash-aggregate, and union 5 single-row results — measured
    2.2-2.5 s -> 0.5-0.6 s at sf0.1 with identical output.

    ``approx=True`` (the 100 TB-shaped default for a profiler): distinct
    counts come from the in-repo HLL sketch (operators.sketches) — NO
    Expand anywhere (plan-pinned in tests): one aggregate pass for
    nulls/min/max (map-side combined to a single row) plus one pass
    that explodes each row into (column, register, rho) probes and
    map-side-combines them to at most |cols|·256 register rows before
    the shuffle. Shuffled bytes are O(|cols|·m), independent of table
    size; relative error ≈ 1.04/√256 ≈ 6.5 % (pinned in tests). Output
    schema is identical (estimates rounded to BIGINT), so callers can
    flip the flag without downstream changes.
    """
    orders = load_table(spark, sf_dir, "orders")

    def rep(col: str, kind: str) -> F.Column:
        c = F.col(col)
        if kind == "cents":
            return (c.cast("decimal(18,2)") * 100).cast("long").cast("string")
        return c.cast("string")

    if not approx:
        parts = []
        for col, kind in PROFILE_COLS:
            parts.append(
                orders.select(F.col(col), rep(col, kind).alias("__r")).agg(
                    F.lit(col).alias("column"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col(col).isNull().cast("long")).alias("n_nulls"),
                    F.count_distinct(F.col(col)).alias("n_distinct"),
                    F.min("__r").alias("min_repr"),
                    F.max("__r").alias("max_repr"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select(
            "column", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr"
        )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in PROFILE_COLS:
        r = rep(col, kind)
        aggs += [
            F.sum(F.col(col).isNull().cast("long")).alias(f"{col}__nulls"),
            F.min(r).alias(f"{col}__min"),
            F.max(r).alias(f"{col}__max"),
        ]
    one = orders.agg(*aggs)
    if approx:
        from ..operators import sketches as SK

        probes = []
        for col, kind in PROFILE_COLS:
            c = F.col(col)
            if kind == "cents":
                v = (c.cast("decimal(18,2)") * 100).cast("long")
            elif kind == "str":
                v = SK.str_hash(c)
            else:
                v = c.cast("long")
            reg, rho = SK.hll_reg_rho(v)
            probes.append(
                F.when(
                    c.isNotNull(),
                    F.struct(
                        F.lit(col).alias("column"),
                        reg.cast("int").alias("reg"),
                        rho.cast("int").alias("rho"),
                    ),
                )
            )
        regs = (
            orders.select(F.explode(F.array(*probes)).alias("e"))
            .filter(F.col("e").isNotNull())
            .select("e.*")
            .groupBy("column", "reg")
            .agg(F.max("rho").alias("rho_max"))
        )
        est = SK.hll_estimate(regs, ["column"]).select(
            "column",
            F.round("hll_estimate").cast("long").alias("n_distinct"),
        )
        stacked = ", ".join(
            f"'{col}', {col}__nulls, {col}__min, {col}__max"
            for col, _ in PROFILE_COLS
        )
        base = one.select(
            "n_rows",
            F.expr(
                f"stack({len(PROFILE_COLS)}, {stacked}) "
                "AS (column, n_nulls, min_repr, max_repr)"
            ),
        )
        # LEFT join: an all-NULL column emits zero HLL probes and has
        # no estimate row — it must still profile (n_distinct 0), as
        # the exact mode does.
        return base.join(F.broadcast(est), "column", "left").select(
            "column",
            "n_rows",
            "n_nulls",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "min_repr",
            "max_repr",
        )
    raise AssertionError("unreachable: both profile modes return above")


def _profile_oracle() -> str:
    parts = []
    for col, kind in PROFILE_COLS:
        r = (
            f"CAST(CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)"
            if kind == "cents"
            else f"CAST({col} AS VARCHAR)"
        )
        parts.append(
            f"SELECT '{col}' AS column, COUNT(*) AS n_rows, "
            f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"COUNT(DISTINCT {col}) AS n_distinct, "
            f"MIN({r}) AS min_repr, MAX({r}) AS max_repr FROM orders"
        )
    return " UNION ALL ".join(parts)


Q88_SQL = _profile_oracle()


# ---------------------------------------------------------------------
# q89 — edit-distance-1 token pairs (deletion-neighborhood join).
# ---------------------------------------------------------------------

#: Deletion-neighborhood blocking is exact for distance ≤ 1: two
#: strings within one edit share a variant (a full string or a
#: one-char deletion). Cap token length so the neighborhood fan-out
#: stays bounded (len+1 variants per token).
FUZZY_MAX_LEN = 12
FUZZY_MIN_COUNT = 2


def q89_fuzzy_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-duplicate tokens across the corpus: distinct
    tokens → deletion neighborhoods → self-join on variant →
    levenshtein ≤ 1 verify. The classic similarity-join shape: the
    quadratic never materializes — candidates are only tokens sharing
    a deletion variant, and the verify runs per candidate pair."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(
            (F.length("tok").between(2, FUZZY_MAX_LEN))
            & (F.col("n") >= FUZZY_MIN_COUNT)
        )
    )
    variants = toks.select(
        "tok",
        F.explode(
            F.array_union(
                F.array(F.col("tok")),
                F.transform(
                    F.sequence(F.lit(1), F.length("tok")),
                    lambda i: F.concat(
                        F.substring(F.col("tok"), F.lit(1), i - 1),
                        F.col("tok").substr(i + 1, F.length("tok")),
                    ),
                ),
            )
        ).alias("var"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, (F.col("a.var") == F.col("b.var")) & (F.col("a.tok") < F.col("b.tok")))
        .select(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .distinct()
    )
    return cand.filter(
        F.levenshtein(F.col("tok_a"), F.col("tok_b")) <= 1
    ).select("tok_a", "tok_b")


Q89_SQL = f"""
WITH toks AS (
  SELECT tok, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY tok
  HAVING length(tok) BETWEEN 2 AND {FUZZY_MAX_LEN} AND COUNT(*) >= {FUZZY_MIN_COUNT}
), variants AS (
  SELECT tok, unnest(list_distinct(list_append(
    list_transform(generate_series(1, length(tok)),
                   i -> substring(tok, 1, i - 1) || substring(tok, i + 1)),
    tok))) AS var
  FROM toks
), cand AS (
  SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
  FROM variants a JOIN variants b ON a.var = b.var AND a.tok < b.tok
)
SELECT tok_a, tok_b FROM cand WHERE levenshtein(tok_a, tok_b) <= 1
"""


# ---------------------------------------------------------------------
# q90 — mergeable histogram sketch → approximate quantiles.
# ---------------------------------------------------------------------

#: Equi-width cent buckets for o_totalprice. A fixed binning is the
#: simplest *mergeable* quantile sketch: partial bucket counts combine
#: map-side like any sum, so the sketch costs one narrow aggregate at
#: any scale (the exact-percentile q80 needs a per-group sort).
HIST_BUCKET_CENTS = 5_000_00


def q90_price_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate order-price quantiles from an equi-width histogram.

    Bucket counts are exact integers; the p50/p90 estimates are the
    lower edge of the first bucket whose cumulative count crosses the
    target rank — integer arithmetic end-to-end, so the approximation
    itself is hash-verified (same contract as the HLL/CMS sketches)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    hist = (
        orders.select((F.floor(cents / F.lit(HIST_BUCKET_CENTS))).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = hist.select(
        "bucket",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tot).alias("total"),
    )
    q = lambda p: F.min(  # noqa: E731 — tiny local expression builder
        F.when(
            F.col("cum") * 100 >= F.col("total") * p,
            F.col("bucket") * HIST_BUCKET_CENTS,
        )
    )
    return cum.agg(
        F.max("total").alias("n_rows"),
        F.count(F.lit(1)).alias("n_buckets"),
        q(50).alias("p50_est_cents"),
        q(90).alias("p90_est_cents"),
    )


Q90_SQL = f"""
WITH hist AS (
  SELECT CAST(FLOOR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS DOUBLE) / {HIST_BUCKET_CENTS}) AS BIGINT) AS bucket,
         COUNT(*) AS n
  FROM orders GROUP BY 1
), cum AS (
  SELECT bucket, n,
         CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM hist
)
SELECT MAX(total) AS n_rows, COUNT(*) AS n_buckets,
       MIN(CASE WHEN cum * 100 >= total * 50 THEN bucket * {HIST_BUCKET_CENTS} END)
         AS p50_est_cents,
       MIN(CASE WHEN cum * 100 >= total * 90 THEN bucket * {HIST_BUCKET_CENTS} END)
         AS p90_est_cents
FROM cum
"""


# ---------------------------------------------------------------------
# q91 — deterministic weighted sample (priority sampling).
# ---------------------------------------------------------------------

PRIORITY_K = 50


def q91_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample of documents without RNG: priority =
    hash(doc_id) / weight (weight = doc length), keep the k smallest.
    The deterministic analog of weighted reservoir sampling — longer
    documents are proportionally likelier to make the sample, and
    results are identical on re-run/backfill.

    Plan shape: the k-smallest selection is ``orderBy().limit(k)`` — a
    genuine TakeOrderedAndProject (per-partition top-k, then a k-row
    merge; no global sort materializes). The rank column is a
    row_number over the ALREADY-SELECTED ≤k rows, so its
    single-partition window sorts k rows, not the table — row_number
    over an unpartitioned window BEFORE the filter would funnel the
    whole table through one task (the q81-docstring trap; plan-pinned
    in tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(SAMPLE_MULT) + F.lit(17), F.lit(SAMPLE_MOD))
    pri = (h.cast("double") + F.lit(1.0)) / F.col("n_chars").cast("double")
    topk = (
        docs.select("doc_id", "source", "n_chars", pri.alias("priority"))
        .orderBy(F.col("priority").asc(), F.col("doc_id").asc())
        .limit(PRIORITY_K)
    )
    w = Window.orderBy(F.col("priority").asc(), F.col("doc_id").asc())
    return topk.withColumn("rn", F.row_number().over(w).cast("long"))


Q91_SQL = f"""
SELECT doc_id, source, n_chars, priority, rn FROM (
  SELECT doc_id, source, n_chars, priority,
         CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rn
  FROM (
    SELECT doc_id, source, n_chars,
           (CAST((doc_id * {SAMPLE_MULT} + 17) % {SAMPLE_MOD} AS DOUBLE) + 1.0)
             / CAST(n_chars AS DOUBLE) AS priority
    FROM documents) t
) r WHERE rn <= {PRIORITY_K}
"""


# ---------------------------------------------------------------------
# q92 — GROUPING SETS (beyond q40's rollup / q41's cube).
# ---------------------------------------------------------------------


def q92_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked grouping sets — (status), (priority), (status,
    priority), () — with grouping_id to tag each stratum. One Expand +
    one aggregate: the N aggregations share a single scan/shuffle
    instead of N plans. Spark exposes grouping sets via SQL."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        """
    )


Q92_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
"""


# ---------------------------------------------------------------------
# q94 — grouped custom Python (applyInPandas).
# ---------------------------------------------------------------------


def q94_user_median_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median event value per (event_type, day) via ``applyInPandas``
    — the batch grouped-Python surface (operators/py_grouped.py).
    Declared Python crossing: exempted by name from the no-Python plan
    pin, which still guards every OTHER oracled query. The op is an
    integer median, so the Arrow round-trip stays hash-exact vs the
    SQL oracle; the key is medium-cardinality by design (see the
    operator docstring for why that is the whole story)."""
    from ..operators.py_grouped import grouped_median_cents

    return grouped_median_cents(load_table(spark, sf_dir, "events"))


Q94_SQL = """
SELECT event_type,
       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
       COUNT(*) AS n_events,
       median(CAST(FLOOR(value * 100) AS BIGINT)) AS median_cents
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------
# q95 — bloom-prefiltered join (runtime-filter analog).
# ---------------------------------------------------------------------

#: Selective threshold: only high-value orders join back to lineitem.
BIG_ORDER_CENTS = 450_000_00


def q95_bloom_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup of lineitems belonging to high-value orders,
    joined via `bloom_prefiltered_join`: the small side's keys become
    a ≤m-row broadcast bit frame that drops non-matching lineitems
    before the join shuffle. False positives are discarded by the
    exact join, so the result is identical to the plain inner join —
    which is exactly what the oracle computes."""
    from ..operators.joins import bloom_prefiltered_join

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    big_orders = orders.select(
        "o_orderkey", "o_orderpriority", cents.alias("order_cents")
    ).filter(F.col("order_cents") > BIG_ORDER_CENTS)
    joined = bloom_prefiltered_join(
        li.select("l_orderkey", "l_extendedprice"),
        big_orders,
        "l_orderkey",
        "o_orderkey",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.count_distinct("o_orderkey").alias("n_orders"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


Q95_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lineitems,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > {BIG_ORDER_CENTS}
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------
# q96 — frame-spanning window functions (first/last/nth value).
# ---------------------------------------------------------------------


def q96_order_value_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: first, latest, and second order price over the
    full partition frame (first_value / last_value / nth_value with an
    unbounded ROWS frame — the window shapes q03/q21 don't cover).
    Unique (date, orderkey) ordering makes every value deterministic;
    one row per customer via the row_number idiom on the same
    partitioning, so the whole query is a single shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", cents.alias("cents")
    )
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("o_custkey").orderBy(*order_cols)
    return (
        base.select(
            "o_custkey",
            F.first("cents").over(full).alias("first_cents"),
            F.last("cents").over(full).alias("last_cents"),
            F.nth_value("cents", 2).over(full).alias("second_cents"),
            F.count(F.lit(1)).over(full).alias("n_orders"),
            F.row_number().over(seq).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


Q96_SQL = """
SELECT o_custkey, first_cents, last_cents, second_cents, n_orders FROM (
  SELECT o_custkey,
         FIRST_VALUE(cents) OVER w AS first_cents,
         LAST_VALUE(cents) OVER w AS last_cents,
         NTH_VALUE(cents, 2) OVER w AS second_cents,
         COUNT(*) OVER w AS n_orders,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders)
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
) t WHERE rn = 1
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
    "q86_supply_pagerank": q86_supply_pagerank,
    "q87_event_transitions": q87_event_transitions,
    "q88_orders_profile": q88_orders_profile,
    "q89_fuzzy_token_pairs": q89_fuzzy_token_pairs,
    "q90_price_histogram_quantiles": q90_price_histogram_quantiles,
    "q91_weighted_doc_sample": q91_weighted_doc_sample,
    "q92_grouping_sets": q92_grouping_sets,
    "q94_user_median_py": q94_user_median_py,
    "q95_bloom_join_revenue": q95_bloom_join_revenue,
    "q96_order_value_spread": q96_order_value_spread,
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
    "q86_supply_pagerank": Q86_SQL,
    "q87_event_transitions": Q87_SQL,
    "q88_orders_profile": Q88_SQL,
    "q89_fuzzy_token_pairs": Q89_SQL,
    "q90_price_histogram_quantiles": Q90_SQL,
    "q91_weighted_doc_sample": Q91_SQL,
    "q92_grouping_sets": Q92_SQL,
    "q94_user_median_py": Q94_SQL,
    "q95_bloom_join_revenue": Q95_SQL,
    "q96_order_value_spread": Q96_SQL,
}
