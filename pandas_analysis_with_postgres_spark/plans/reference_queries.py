"""Reference-parity queries (SURVEY §2) over the driver test tables.

Each query exercises one or more operators from the reference
(``/root/reference/dmCustomerProc.py``), re-targeted at the TPC-H-ish
fixture tables per FIXTURES.md's role mapping (customer/nation/region =
lookup dims, orders/lineitem = facts, events = stream-shaped).

Determinism rules (the DuckDB harness hash-compares values):
- money aggregates go through ``DECIMAL(18,2)`` (exact) and are cast to
  DOUBLE only at the end — both engines then emit bit-identical values;
- every computed column is aliased identically in Spark and SQL;
- no wall-clock: timestamps are pinned literals;
- ratio math uses the same operand order in both engines (IEEE doubles
  are deterministic given identical operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.flags import existence_flag, one_hot_flags, range_flag
from ..operators.aggregates import group_count
from ..operators.joins import (
    asof_join,
    cross_join_defaults,
    existence_flag_join,
    lookup_join,
    range_join,
)
from ..operators.scd2 import scd2_apply
from ..operators.setops import except_all_on, union_by_name
from ..operators.upsert import upsert
from ..operators.windows import keep_first_dedup, top1_per_group
from ..sources.parquet import load_table, register_views
from .timeutil import epoch_seconds


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# --------------------------------------------------------------------
# q01 — pricing summary (A1/A3-style wide aggregation; headline agg).
# Exercises partial (map-side) aggregation; at 100 TB this is a scan +
# 6-group shuffle, the cheapest possible shape.
# --------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------
# q02 — wide-customer enrichment (flagship; reference E1 in miniature:
# J1 left join, J2-J4 broadcast lookups, A1 pre-aggregated counts, P4
# flag). customer ⟕ nation ⟗ region + order-count/spend + flags.
# --------------------------------------------------------------------
def q02_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")

    dim = lookup_join(
        cust,
        nation,
        on=cust.c_nationkey == F.col("n_nationkey"),
        broadcast=True,  # nation: 25 rows at any SF
        rename={"n_name": "nation_name"},
    )
    dim = lookup_join(
        dim,
        region,
        on=F.col("n_regionkey") == F.col("r_regionkey"),
        broadcast=True,  # region: 5 rows at any SF
        rename={"r_name": "region_name"},
    )
    counts = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(_dec("o_totalprice")).alias("__spend"),
    )
    out = dim.join(counts, dim.c_custkey == counts.o_custkey, "left")
    return out.select(
        "c_custkey",
        "c_name",
        "nation_name",
        "region_name",
        "c_mktsegment",
        F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
        F.coalesce(F.col("__spend").cast("double"), F.lit(0.0)).alias("total_spent"),
        F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("is_high_balance"),
    )


Q02_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name,
       c.c_mktsegment,
       COALESCE(o.order_count, 0) AS order_count,
       COALESCE(CAST(o.__spend AS DOUBLE), 0.0) AS total_spent,
       CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END AS is_high_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS order_count,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS __spend
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


# --------------------------------------------------------------------
# q03 — latest order per customer (W1/W2: rank-desc + keep top-1;
# row_number variant with orderkey tiebreak for determinism).
# --------------------------------------------------------------------
def q03_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    top = top1_per_group(
        orders,
        "o_custkey",
        [F.desc("o_orderdate"), F.desc("o_orderkey")],
        method="row_number",
    )
    return top.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


Q03_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


# --------------------------------------------------------------------
# q04 — group count (A1: dmCustomerProc.py:52).
# --------------------------------------------------------------------
def q04_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_count(load_table(spark, sf_dir, "orders"), "o_custkey", "order_count")


Q04_SQL = "SELECT o_custkey, COUNT(*) AS order_count FROM orders GROUP BY o_custkey"


# --------------------------------------------------------------------
# q05 — existence flags + range flag (J11/J12 distinct+left-join+notnull,
# P4/P5: dmCustomerProc.py:84-96,182).
# --------------------------------------------------------------------
def q05_customer_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # orders is the fact side — its distinct custkey set is customer-
    # cardinality, not dim-cardinality, so never force a broadcast.
    out = existence_flag_join(
        cust, orders, "c_custkey", "o_custkey", "has_order", broadcast=False
    )
    big = orders.filter(F.col("o_totalprice") > 100000)
    out = existence_flag_join(
        out, big, "c_custkey", "o_custkey", "has_big_order", broadcast=False
    )
    return out.select(
        "c_custkey",
        "has_order",
        "has_big_order",
        range_flag("c_acctbal", 0, 1000).alias("low_balance"),
    )


Q05_SQL = """
SELECT c_custkey,
  CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) THEN 1 ELSE 0 END AS has_order,
  CASE WHEN c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
       THEN 1 ELSE 0 END AS has_big_order,
  CASE WHEN c_acctbal BETWEEN 0 AND 1000 THEN 1 ELSE 0 END AS low_balance
FROM customer
"""


# --------------------------------------------------------------------
# q06 — deterministic keep-first dedup (D2: dmCustomerProc.py:101,
# pandas keep-first re-derived with an explicit tiebreak).
# --------------------------------------------------------------------
def q06_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    first = keep_first_dedup(
        orders, "o_custkey", [F.asc("o_orderdate"), F.asc("o_orderkey")]
    )
    return first.select("o_custkey", "o_orderkey", "o_orderdate")


Q06_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
"""


# --------------------------------------------------------------------
# q07 — distinct projection (D1: dmCustomerProc.py:85,93).
# --------------------------------------------------------------------
def q07_distinct_open_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .distinct()
    )


Q07_SQL = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'"


# --------------------------------------------------------------------
# q08 — union by name with NULL fill (U1: dmCustomerProc.py:188,202).
# The supplier side deliberately lacks `acctbal` to exercise
# allowMissingColumns NULL filling.
# --------------------------------------------------------------------
def q08_party_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("cust").alias("kind"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.lit("supp").alias("kind"),
    )
    return union_by_name(cust, supp)


Q08_SQL = """
SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, 'cust' AS kind FROM customer
UNION ALL
SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE), 'supp' FROM supplier
"""


# --------------------------------------------------------------------
# q09 — EXCEPT ALL (intended semantics of X1: dmCustomerProc.py:208).
# --------------------------------------------------------------------
def q09_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    known = cust.filter(F.col("c_custkey") % 3 == 0)
    return except_all_on(cust, known)


Q09_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
EXCEPT ALL
SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 = 0
"""


# --------------------------------------------------------------------
# q10 — anti join (J19: the reference's left-join + exists==0 probe,
# dmCustomerProc.py:197-199, is one left_anti in Spark).
# --------------------------------------------------------------------
def q10_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


Q10_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --------------------------------------------------------------------
# q11 — semi join (J20-in-spirit: dmCustomerProc.py:213).
# --------------------------------------------------------------------
def q11_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


Q11_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --------------------------------------------------------------------
# q12 — broadcast cross-join of a 1-row defaults frame + coalesce
# (intended semantics of J13 + P8: dmCustomerProc.py:145-163; the
# reference's merge-on-[1] KeyError bug implemented per intent).
# --------------------------------------------------------------------
def q12_spend_with_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("spend")
    )
    defaults = orders.agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "default_spend"
        )
    )
    withspend = cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
    out = cross_join_defaults(withspend, defaults)
    return out.select(
        "c_custkey",
        F.coalesce(F.col("spend"), F.col("default_spend")).alias("effective_spend"),
    )


Q12_SQL = """
SELECT c.c_custkey,
       COALESCE(s.spend, d.default_spend) AS effective_spend
FROM customer c
LEFT JOIN (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
) s ON c.c_custkey = s.o_custkey
CROSS JOIN (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS default_spend
  FROM orders
) d
"""


# --------------------------------------------------------------------
# q13 — one-hot flag encoding + per-entity collapse (P7: the
# reference's 18 masked assignments, dmCustomerProc.py:104-112,122-139,
# as CASE WHEN columns + MAX pivot-collapse).
# --------------------------------------------------------------------
_EVENT_FLAGS = {
    "signup": "is_signup",
    "click": "is_click",
    "view": "is_view",
    "purchase": "is_purchase",
    "error": "is_error",
}


def q13_user_event_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    flagged = one_hot_flags(events, "event_type", _EVENT_FLAGS)
    return flagged.groupBy("user_id").agg(
        *[F.max(flag).alias(flag) for flag in _EVENT_FLAGS.values()]
    )


Q13_SQL = """
SELECT user_id,
       MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS is_signup,
       MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS is_click,
       MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS is_view,
       MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS is_purchase,
       MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS is_error
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------
# q14 — chained conditional flags on a code column (P7 single-row form)
# + existence flag (P4) on the order file itself.
# --------------------------------------------------------------------
def q14_order_priority_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_rush"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_finished"),
        existence_flag("o_orderdate").alias("has_date"),
    )


Q14_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_rush,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_finished,
       CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS has_date
FROM orders
"""


# --------------------------------------------------------------------
# q15 — keyed upsert (M1 UPDATE-from + M2 INSERT-if-absent:
# dmCustomerProc.py:193,197-203). dim = even customers; staged = every
# third customer with a +100 balance and some NULLed segments — NULL
# staged values must KEEP the old dim value (pandas update semantics).
# --------------------------------------------------------------------
def q15_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    dim = cust.filter(F.col("c_custkey") % 2 == 0)
    staged = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.when(F.col("c_custkey") % 9 == 0, F.lit(None)).otherwise(
            F.col("c_mktsegment")
        ).alias("c_mktsegment"),
    )
    return upsert(dim, staged, "c_custkey")


Q15_SQL = """
WITH dim AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 2 = 0
),
staged AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
         CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT d.c_custkey,
       COALESCE(s.c_name, d.c_name) AS c_name,
       COALESCE(s.c_acctbal, d.c_acctbal) AS c_acctbal,
       COALESCE(s.c_mktsegment, d.c_mktsegment) AS c_mktsegment
FROM dim d LEFT JOIN staged s ON d.c_custkey = s.c_custkey
UNION ALL
SELECT s.* FROM staged s
WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.c_custkey = s.c_custkey)
"""


# --------------------------------------------------------------------
# q16 — SCD2 maintenance round (X1 + M3 + M4: dmCustomerProc.py:205-232)
# with pinned timestamps. History = all customers current since 2020;
# staged = customers where every fifth key got a +50 balance change.
# --------------------------------------------------------------------
def q16_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    t2020 = F.lit("2020-01-01").cast("timestamp")
    history = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        t2020.alias("effective_from_date"),
        F.lit(None).cast("timestamp").alias("effective_to_date"),
        F.lit(1).alias("is_current_record"),
        t2020.alias("sys_effective_from_date"),
        F.lit(None).cast("timestamp").alias("sys_effective_to_date"),
    )
    staged = cust.select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 50)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
        F.lit("2024-06-01").cast("timestamp").alias("change_ts"),
        F.lit("2019-01-01").cast("timestamp").alias("create_ts"),
    )
    out = scd2_apply(
        history,
        staged,
        "c_custkey",
        change_ts_col="change_ts",
        create_ts_col="create_ts",
        now=F.lit("2024-07-01").cast("timestamp"),
        compare_cols=["c_name", "c_acctbal", "c_mktsegment"],
    )
    return out.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        "effective_from_date",
        "effective_to_date",
        "is_current_record",
        "sys_effective_from_date",
        "sys_effective_to_date",
    )


Q16_SQL = """
WITH history AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         TIMESTAMP '2020-01-01' AS effective_from_date,
         CAST(NULL AS TIMESTAMP) AS effective_to_date,
         1 AS is_current_record,
         TIMESTAMP '2020-01-01' AS sys_effective_from_date,
         CAST(NULL AS TIMESTAMP) AS sys_effective_to_date
  FROM customer
),
staged AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50 ELSE c_acctbal END AS c_acctbal,
         c_mktsegment,
         TIMESTAMP '2024-06-01' AS change_ts,
         TIMESTAMP '2019-01-01' AS create_ts
  FROM customer
),
changed AS (
  SELECT s.* FROM staged s
  LEFT JOIN history h ON s.c_custkey = h.c_custkey AND h.is_current_record = 1
  WHERE h.c_custkey IS NULL
     OR NOT (s.c_name IS NOT DISTINCT FROM h.c_name
         AND s.c_acctbal IS NOT DISTINCT FROM h.c_acctbal
         AND s.c_mktsegment IS NOT DISTINCT FROM h.c_mktsegment)
),
closed AS (
  SELECT h.c_custkey, h.c_name, h.c_acctbal, h.c_mktsegment,
         h.effective_from_date,
         COALESCE(c.change_ts, c.create_ts) AS effective_to_date,
         0 AS is_current_record, h.sys_effective_from_date,
         TIMESTAMP '2024-07-01' AS sys_effective_to_date
  FROM history h JOIN changed c ON h.c_custkey = c.c_custkey
  WHERE h.is_current_record = 1
),
untouched AS (
  SELECT h.* FROM history h
  WHERE h.is_current_record = 1
    AND NOT EXISTS (SELECT 1 FROM changed c WHERE c.c_custkey = h.c_custkey)
),
opened AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         COALESCE(change_ts, create_ts) AS effective_from_date,
         CAST(NULL AS TIMESTAMP) AS effective_to_date,
         1 AS is_current_record,
         TIMESTAMP '2024-07-01' AS sys_effective_from_date,
         CAST(NULL AS TIMESTAMP) AS sys_effective_to_date
  FROM changed
)
SELECT * FROM untouched
UNION ALL SELECT * FROM closed
UNION ALL SELECT * FROM opened
"""


# --------------------------------------------------------------------
# q17 — dense_rank with ties kept (exact reference W1 semantics:
# rank('dense', ascending=False) then rank == 1, dmCustomerProc.py:65-67;
# ties on l_quantity keep multiple rows).
# --------------------------------------------------------------------
def q17_max_quantity_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    top = top1_per_group(li, "l_orderkey", [F.desc("l_quantity")], method="dense_rank")
    return top.select("l_orderkey", "l_linenumber", "l_quantity")


Q17_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
QUALIFY DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) = 1
"""


# --------------------------------------------------------------------
# q18 — JSON extraction over the events props column (extension:
# SURVEY §1 "nested" row — F.get_json_object → typed column).
# --------------------------------------------------------------------
def q18_event_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q18_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------
# q19 — sessionization (batch form; gap > 30 min starts a new session).
# lag + conditional-sum is the classic distributed sessionization: one
# shuffle on user_id, no state. Streaming twin lives in streaming/.
# Second-granularity via unix_timestamp matches DuckDB floor(epoch())
# and resolves for both TIMESTAMP and TIMESTAMP_NTZ source columns
# (parquet without isAdjustedToUTC reads as NTZ under Spark 4's
# inferTimestampNTZ default; cast-to-long is NTZ-illegal).
# --------------------------------------------------------------------
def q19_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = epoch_seconds(F.col("ts"))
    prev = F.lag(secs).over(w)
    new_session = F.when(prev.isNull() | ((secs - prev) > 1800), 1).otherwise(0)
    return (
        events.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("new_s").alias("n_sessions"),
        )
    )


Q19_SQL = """
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_s) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN prev_s IS NULL OR (s - prev_s) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM (
    SELECT user_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
           LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
    FROM events
  ) t
) t2
GROUP BY user_id
"""


# --------------------------------------------------------------------
# q20 — hourly tumbling rollup (batch analog of the streaming window;
# F.window('1 hour') start == date_trunc('hour') for epoch-aligned
# windows).
# --------------------------------------------------------------------
def q20_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


Q20_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# q21 — window analytics beyond the reference (lag + running sum;
# extension of §2.6 — frame specs the reference never needed).
# --------------------------------------------------------------------
def q21_order_sequence_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.lag(_dec("o_totalprice").cast("double")).over(w).alias("prev_price"),
        F.sum(_dec("o_totalprice")).over(wsum).cast("double").alias("running_spend"),
    )


Q21_SQL = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       LAG(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER w AS prev_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------
# q40/q41 — rollup & cube (SURVEY §2.5: "grouping sets … Spark provides
# for free when we extend"; the reference has no multi-level aggs).
# Subtotal rows carry NULL group keys in both engines.
# --------------------------------------------------------------------
def q40_returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


Q40_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q41_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
    )


Q41_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------
# q43 — distinct aggregate (SURVEY §2.5: absent from the reference,
# free in Spark). COUNT(DISTINCT) plans as a two-phase expand+agg.
# --------------------------------------------------------------------
def q43_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q43_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------
# q44 — SQL front-end: the exact oracle string is executed by
# spark.sql over registered views, proving the engine's SQL surface
# and the DataFrame surface share one catalog (SURVEY §1 "Catalog").
# --------------------------------------------------------------------
Q44_SQL = """
SELECT n_name AS nation_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q44_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "nation")
    return spark.sql(Q44_SQL)


# --------------------------------------------------------------------
# q45 — as-of join (extension: the temporal operator Spark's join zoo
# lacks, built as union + one window pass; oracle is DuckDB's native
# ASOF JOIN). "Latest event state at order time" per user.
# --------------------------------------------------------------------
def q45_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the user's most recent order at or before event
    time. The right side is pre-aggregated to unique (key, ts) — DuckDB
    ASOF offers no tiebreak among equal timestamps, so determinism must
    come from uniqueness, not ordering."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_order_key"))
    )
    return asof_join(
        events,
        daily,
        by="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols={"last_order_key": "last_order_key", "o_orderdate": "last_order_date"},
    )


Q45_SQL = """
WITH daily AS (
  SELECT o_custkey AS user_id, o_orderdate, MAX(o_orderkey) AS last_order_key
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       d.last_order_key, d.o_orderdate AS last_order_date
FROM events e ASOF LEFT JOIN daily d
  ON e.user_id = d.user_id AND d.o_orderdate <= e.ts
"""


# --------------------------------------------------------------------
# q48 — JSON → MapType → explode (SURVEY §1 nested row: props as a
# real map, not string extraction like q18). Per-key aggregate over
# the exploded entries.
# --------------------------------------------------------------------
def q48_props_map_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    entries = events.select(
        F.explode(F.from_json(F.col("props"), "map<string,int>")).alias("key", "val")
    )
    return entries.groupBy("key").agg(
        F.sum("val").alias("sum_val"),
        F.count(F.lit(1)).alias("n_entries"),
    )


Q48_SQL = """
WITH kv AS (
  SELECT unnest(json_keys(props)) AS key, props FROM events
)
SELECT key,
       CAST(SUM(CAST(json_extract_string(props, '$.' || key) AS INT)) AS BIGINT) AS sum_val,
       COUNT(*) AS n_entries
FROM kv GROUP BY key
"""


# --------------------------------------------------------------------
# q50 — interval-containment join via the bucket-blocked range_join
# operator (extension: the join flavor Spark's planner turns into a
# nested loop; the reference has no non-equi joins at all, SURVEY §2.4).
# Promo periods = first 7 days of each order month; count orders and
# revenue landing inside a period.
# --------------------------------------------------------------------
def q50_promo_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    periods = (
        orders.select(F.date_trunc("month", "o_orderdate").alias("p_start"))
        .distinct()
        .withColumn("p_end", F.col("p_start") + F.expr("INTERVAL 6 DAYS"))
    )
    joined = range_join(
        orders,
        periods,
        point_col="o_orderdate",
        start_col="p_start",
        end_col="p_end",
        # Day buckets: each 7-day interval explodes to 7 bucket rows;
        # the join is then a pure equi-join on the day ordinal.
        bucket=lambda c: F.floor(F.unix_timestamp(c) / F.lit(86400)).cast("long"),
    )
    return joined.groupBy(F.col("p_start").alias("promo_month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("promo_revenue"),
    )


Q50_SQL = """
WITH periods AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS p_start FROM orders
),
iv AS (SELECT p_start, p_start + INTERVAL 6 DAY AS p_end FROM periods)
SELECT iv.p_start AS promo_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue
FROM orders o
JOIN iv ON o.o_orderdate BETWEEN iv.p_start AND iv.p_end
GROUP BY 1
"""


# --------------------------------------------------------------------
# q51 — exact per-group percentiles (extension; the scalable form is
# approx_percentile with bounded error, but the exact form is the
# oracle-able surface and fine for group-sized partitions).
# --------------------------------------------------------------------
def q51_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return orders.groupBy("o_orderstatus").agg(
        F.element_at(pct, 1).alias("p50"),
        F.element_at(pct, 2).alias("p90"),
        F.element_at(pct, 3).alias("p99"),
    )


Q51_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------
# q54 — multi-resolution time rollup (hypertable-style continuous
# aggregate hierarchy): hour within day within grand total, one pass
# via ROLLUP grouping sets. min/max over doubles are order-independent,
# so the oracle hash-matches without decimal staging.
# --------------------------------------------------------------------
def q54_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return ev.rollup("day", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


Q54_SQL = """
SELECT date_trunc('day', ts) AS day,
       date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
"""


REFERENCE_QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_customer_profile": q02_customer_profile,
    "q03_latest_order_per_customer": q03_latest_order_per_customer,
    "q04_order_counts": q04_order_counts,
    "q05_customer_flags": q05_customer_flags,
    "q06_first_order_per_customer": q06_first_order_per_customer,
    "q07_distinct_open_order_customers": q07_distinct_open_order_customers,
    "q08_party_union": q08_party_union,
    "q09_except_all": q09_except_all,
    "q10_customers_without_orders": q10_customers_without_orders,
    "q11_customers_with_orders": q11_customers_with_orders,
    "q12_spend_with_defaults": q12_spend_with_defaults,
    "q13_user_event_flags": q13_user_event_flags,
    "q14_order_priority_flags": q14_order_priority_flags,
    "q15_upsert": q15_upsert,
    "q16_scd2": q16_scd2,
    "q17_max_quantity_lineitems": q17_max_quantity_lineitems,
    "q18_event_props_rollup": q18_event_props_rollup,
    "q19_user_sessions": q19_user_sessions,
    "q20_hourly_rollup": q20_hourly_rollup,
    "q21_order_sequence_analytics": q21_order_sequence_analytics,
    "q40_returnflag_rollup": q40_returnflag_rollup,
    "q41_status_priority_cube": q41_status_priority_cube,
    "q43_distinct_customers_per_status": q43_distinct_customers_per_status,
    "q44_sql_frontend": q44_sql_frontend,
    "q45_asof_latest_order": q45_asof_latest_order,
    "q48_props_map_rollup": q48_props_map_rollup,
    "q50_promo_range_join": q50_promo_range_join,
    "q51_order_value_percentiles": q51_order_value_percentiles,
    "q54_multires_rollup": q54_multires_rollup,
}

REFERENCE_ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q02_customer_profile": Q02_SQL,
    "q03_latest_order_per_customer": Q03_SQL,
    "q04_order_counts": Q04_SQL,
    "q05_customer_flags": Q05_SQL,
    "q06_first_order_per_customer": Q06_SQL,
    "q07_distinct_open_order_customers": Q07_SQL,
    "q08_party_union": Q08_SQL,
    "q09_except_all": Q09_SQL,
    "q10_customers_without_orders": Q10_SQL,
    "q11_customers_with_orders": Q11_SQL,
    "q12_spend_with_defaults": Q12_SQL,
    "q13_user_event_flags": Q13_SQL,
    "q14_order_priority_flags": Q14_SQL,
    "q15_upsert": Q15_SQL,
    "q16_scd2": Q16_SQL,
    "q17_max_quantity_lineitems": Q17_SQL,
    "q18_event_props_rollup": Q18_SQL,
    "q19_user_sessions": Q19_SQL,
    "q20_hourly_rollup": Q20_SQL,
    "q21_order_sequence_analytics": Q21_SQL,
    "q40_returnflag_rollup": Q40_SQL,
    "q41_status_priority_cube": Q41_SQL,
    "q43_distinct_customers_per_status": Q43_SQL,
    "q44_sql_frontend": Q44_SQL,
    "q45_asof_latest_order": Q45_SQL,
    "q48_props_map_rollup": Q48_SQL,
    "q50_promo_range_join": Q50_SQL,
    "q51_order_value_percentiles": Q51_SQL,
    "q54_multires_rollup": Q54_SQL,
}
