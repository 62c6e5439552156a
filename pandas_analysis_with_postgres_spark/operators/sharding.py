"""Scale-safe global ordering: contiguous ranks and shard assignment
without a single-task sort.

The last step of a training-data pipeline is writing N equal shards in
a deterministic global order. The naive plan — ``row_number() OVER
(ORDER BY key)`` — collapses to ONE task holding the whole table
(Spark physically plans an empty-partition window as a global sort
into a single partition): correct on 60k rows, dead at 100 TB.

``global_rank`` computes the identical ranks with the standard
two-level construction:

1. coarse order-aligned bucket = ``key DIV bucket_width`` — a pure
   projection, no shuffle;
2. exact per-bucket counts (one map-side-combined aggregation), cumsum
   on the driver — O(#buckets) rows, bounded by keyspace/bucket_width,
   a metadata-sized frame at any data scale;
3. ``rank = bucket_offset + row_number() OVER (PARTITION BY bucket
   ORDER BY key)`` — the window now runs per-bucket, fully parallel,
   and the bucket offsets join back via broadcast.

The result is bit-identical to the naive global window (the oracle
replays exactly that), which is the point: same answer, scalable plan.

Contract: ``order_col`` values must be UNIQUE (they are ranks'
tie-breaker-free sort key). Ties would make ``row_number`` historic
nondeterminism in both plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


from ..functions.inthash import HASH_MOD, HASH_MULTS

#: Multiplicative-hash constants for :func:`shuffled_rank` — the
#: shared engine-exact construction (see ``functions.inthash`` for
#: the overflow and SIGN reasoning: replaying the permutation in a
#: dialect whose ``%`` follows the dividend's sign requires the
#: pmod-equivalent ``((v % MOD) + MOD) % MOD`` when keys can be
#: negative; plain ``%`` is exact for non-negative keys).
SHUFFLE_MULT = HASH_MULTS[0]
SHUFFLE_MOD = HASH_MOD


def global_rank(
    df: DataFrame,
    order_col: str,
    *,
    bucket_width: int = 4096,
    num_shards: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add a contiguous 1-based ``rank`` (global order by
    ``order_col``) and, when ``num_shards`` is set, an equal-size
    ``shard`` in [0, num_shards) — ``shard = (rank-1)*S DIV total``,
    integer-exact in any engine.

    Choose ``bucket_width`` so keyspace/width stays driver-friendly
    (≤ ~1e6 buckets): the driver materializes one (bucket, count) row
    per NON-EMPTY bucket, never the data.

    ``tiebreak_col`` extends the in-bucket sort to
    ``(order_col, tiebreak_col)`` for callers whose primary order
    column is not unique by itself (e.g. :func:`shuffled_rank`'s
    permutation values); the (order_col, tiebreak_col) PAIR must then
    be unique. Bucketing stays on ``order_col`` alone, which is
    correct because equal order values always share a bucket.
    """
    bucket = F.expr(f"CAST({order_col} AS BIGINT) DIV {bucket_width}")
    # Pin the input plan BEFORE collecting bucket counts: the counts
    # job and the rank join below are two evaluations of ``df``, and a
    # nondeterministic source (sample(), limit(), rand-derived keys)
    # would otherwise yield offsets inconsistent with the second pass —
    # silently gapped/duplicate ranks. Same guard write_snapshot uses
    # before computing bloom bitmaps. eager=False: the counts job
    # itself materializes the checkpoint, no extra pass.
    staged = df.withColumn("__bucket", bucket).localCheckpoint(eager=False)
    rows = staged.groupBy("__bucket").count().collect()
    # NULL keys (or keys CAST cannot make integral) land in a NULL
    # bucket, which an equi-join would silently drop — refuse loudly
    # instead: ranks over a partial frame are a correctness landmine
    # for shard exports. Detected from the already-collected counts,
    # no extra job.
    null_bucket = next((r for r in rows if r["__bucket"] is None), None)
    if null_bucket is not None:
        raise ValueError(
            f"global_rank: {null_bucket['count']} row(s) have a NULL "
            f"(or non-integral) {order_col!r}; the order column must be "
            "non-null integral-castable"
        )
    offsets = []
    acc = 0
    for r in sorted(rows, key=lambda r: r["__bucket"]):
        offsets.append((r["__bucket"], acc))
        acc += r["count"]
    total = acc
    spark = df.sparkSession
    from pyspark.sql.types import StructType

    from ..sources.metadata_sql import _local_rows_df

    # JVM-side literal frame (lit->explode): createDataFrame would pay
    # a Python-worker launch for O(buckets) driver-local rows
    off = _local_rows_df(
        spark, offsets, StructType.fromDDL("__bucket long, __offset long")
    )
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy("__bucket").orderBy(*order_cols)
    out = (
        staged.join(F.broadcast(off), "__bucket")
        .withColumn("rank", F.col("__offset") + F.row_number().over(w))
        .drop("__bucket", "__offset")
    )
    if num_shards is not None:
        out = out.withColumn(
            "shard",
            F.expr(f"(rank - 1) * {num_shards} DIV {total}").cast("int"),
        )
    return out


def shuffled_rank(
    df: DataFrame,
    key_col: str,
    *,
    seed: int = 0,
    num_shards: int | None = None,
) -> DataFrame:
    """Deterministic pseudorandom global PERMUTATION rank — the
    "shuffle the corpus before training" step, reproducible across
    reruns and engines: rank follows ``(key * MULT + seed') % MOD``
    (multiplicative hash, Mersenne-prime modulus — the a79 sampler's
    engine-agnostic construction) with the key itself as tie-break.
    Different seeds give statistically independent permutations, so
    per-epoch reshuffles are just ``seed=epoch``.

    Same two-level scale shape as :func:`global_rank` (which this
    wraps): permutation values spread uniformly over [0, MOD), so
    DIV-bucketing them yields ~4096 evenly-loaded buckets regardless
    of key skew. Keys must be unique and non-null integral-castable;
    distinct keys may share a permutation value (MOD = 2^31-1 —
    expected once the corpus nears billions of documents), in which
    case the key tie-break keeps the rank total and deterministic
    with a locally-sequential clump, statistically irrelevant.
    Compose with :func:`write_shards` by pre-computing the permutation
    column, or feed ``num_shards`` here for shard ids in shuffled
    order.
    """
    perm = F.pmod(
        F.pmod(F.col(key_col).cast("long"), F.lit(SHUFFLE_MOD))
        * F.lit(SHUFFLE_MULT)
        + F.lit((seed * 0x9E3779B9) % SHUFFLE_MOD),
        F.lit(SHUFFLE_MOD),
    )
    staged = df.withColumn("__perm", perm)
    out = global_rank(
        staged,
        "__perm",
        bucket_width=SHUFFLE_MOD >> 12,
        num_shards=num_shards,
        tiebreak_col=key_col,
    )
    return out.drop("__perm")


def write_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    num_shards: int,
    *,
    bucket_width: int = 4096,
    token_col: str | None = None,
    file_format: str = "parquet",
) -> dict:
    """Export ``df`` as ``num_shards`` equal, contiguous,
    deterministically ordered shards — the final write of a
    training-data pipeline (each trainer rank reads ``shard=i``).

    Built on :func:`global_rank`: shard boundaries follow the global
    order of ``order_col`` (shard 0 holds the lowest ranks), rows are
    shard-clustered (hash repartition on the shard id — a task may
    carry more than one shard, never a split shard) and sorted by rank
    inside each file, and the hive layout ``path/shard=N/`` makes a
    single shard's read a partition-pruned scan. Returns (and writes
    as ``path/_shards.json``) a manifest with per-shard row counts —
    and per-shard ``token_col`` sums when given, the number a training
    scheduler actually balances on. EVERY shard id in
    ``[0, num_shards)`` has a manifest entry: a shard left empty
    because rows < num_shards reports ``rows: 0`` (and no data dir),
    so a scheduler iterating the manifest never hits a hole. The
    manifest aggregate is O(num_shards), collected AFTER the data
    write from the same ranked frame.

    ``file_format``: ``"parquet"`` (default) or ``"json"`` — JSONL is
    what many trainer data loaders stream directly; the layout,
    ordering, and manifest are identical either way.
    """
    import json
    import os

    ranked = global_rank(
        df, order_col, bucket_width=bucket_width, num_shards=num_shards
    )
    # global_rank pins its INPUT, which fixes the bucket offsets — but
    # the per-bucket row_number still resolves ties by shuffle arrival
    # order, which can differ between the data write and the manifest
    # aggregate (two jobs). Checkpoint the RANKED output so both read
    # one materialization; order_col uniqueness makes this redundant,
    # but the manifest must match the files even for contract-breaking
    # inputs.
    ranked = ranked.localCheckpoint(eager=False)
    if file_format not in {"parquet", "json"}:
        raise ValueError(f"unsupported shard format {file_format!r}")
    (
        ranked.repartition(num_shards, "shard")
        .sortWithinPartitions("rank")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(file_format)
        .save(path)
    )
    aggs = [F.count(F.lit(1)).alias("rows"), F.min("rank").alias("lo"),
            F.max("rank").alias("hi")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("token_sum"))
    per = {
        int(r["shard"]): {
            k: int(r[k]) for k in (["rows", "lo", "hi"] + (["token_sum"] if token_col else []))
        }
        for r in ranked.groupBy("shard").agg(*aggs).collect()
    }
    # No holes: a shard with no rows (num_shards > total rows) still
    # gets an explicit zero entry.
    for s in range(num_shards):
        per.setdefault(
            s,
            {"rows": 0, "lo": None, "hi": None}
            | ({"token_sum": 0} if token_col else {}),
        )
    manifest = {
        "num_shards": num_shards,
        "order_col": order_col,
        "total_rows": sum(s["rows"] for s in per.values()),
        "shards": per,
    }
    with open(os.path.join(path, "_shards.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
