"""Incremental materialized-view maintenance over the change-data feed.

A 100 TB warehouse does not recompute its downstream aggregates from
scratch on every upstream commit — it applies the DELTA. This module
closes that loop with the pieces already in the repo: the source table
emits a CDF (``snapshot.diff_snapshots`` rows tagged
insert/delete/update_pre/update_post), and the aggregate table is
itself a snapshot table updated via a txn-idempotent
``merge_snapshot``.

Exactly-once WITHOUT a separate cursor: the view table's own txn
watermark IS the durable cursor. Each cycle reads the watermark
``txn[consumer_id]`` from the view's manifest, consumes the feed
``(watermark, latest]`` (bounded to the ``latest`` snapshotted before
the read — a racing source commit is delivered next cycle), and merges
with ``txn=(consumer_id, latest)`` — so consumed-range bookkeeping and
the data it produced advance in ONE atomic commit. There is no state
that can diverge: a crash anywhere either left the commit published
(watermark advanced, next cycle starts after it) or not (next cycle
replays the identical range). A separate cursor file would reintroduce
the classic double-apply race: crash between merge and cursor write,
then a NEW source commit widens the retry's range so its txn version
exceeds the recorded watermark and the already-applied deltas land
again.

Why additive aggregates: SUM and COUNT are self-inverse under the CDF
signs (+post −pre), so a group's new value is ``old + Σ signed
deltas`` with NO access to the source's unchanged rows. One
maintenance cycle costs O(changed partitions of the source) + O(
touched groups of the view) — independent of both table sizes. (MIN /
MAX / DISTINCT are not incrementally maintainable from deltas alone —
a deleted minimum needs a rescan; that is a fundamental property of
the algebra, not a limitation of this implementation, and callers
needing them should recompute or keep a sketch.)

Scale shape per cycle: the feed is scanned once (manifest-scoped), the
signed delta is one map-side-combinable aggregation producing
O(touched groups) rows, the view read is pruned to the touched groups'
buckets, and the merge rewrites only those buckets.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: The view's partition key: a stable bucket of the group column so a
#: maintenance cycle touching few groups rewrites few partitions.
VIEW_BUCKETS = 16


def _pin_n_buckets(view_path: str, n_buckets: int) -> None:
    """``n_buckets`` is FIXED AT BOOTSTRAP: the merge's stable-partition
    contract hashes each group to ``bucket = xxhash64(group) % n``, so
    a later cycle run with a different ``n`` re-homes groups into
    different buckets — the old row survives in its cold bucket and
    the view silently accumulates duplicate rows per group. Record the
    bootstrap value in a write-once sidecar and raise on mismatch (the
    same constraint scd2's lakehouse merge documents; here it is
    enforced). The sidecar is config, not data — rewriting it with
    identical content on a concurrent bootstrap is idempotent."""
    cfg = os.path.join(view_path, "_view_config.json")
    if os.path.exists(cfg):
        with open(cfg) as f:
            recorded = int(json.load(f)["n_buckets"])
        if recorded != n_buckets:
            raise ValueError(
                f"n_buckets={n_buckets} does not match the value this view "
                f"was bootstrapped with ({recorded}); the bucket layout is "
                f"fixed at bootstrap — re-create the view to change it"
            )
        return
    os.makedirs(view_path, exist_ok=True)
    tmp = cfg + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_buckets": int(n_buckets)}, f)
    os.replace(tmp, cfg)


def signed_delta(
    feed: DataFrame, group_col: str, sum_col: str
) -> DataFrame:
    """Collapse a CDF frame to per-group ``(d_rows, d_sum)``:
    insert/update_post count +, delete/update_pre count −. Groups whose
    delta nets to zero still emit a row (harmless: the merge rewrites
    their bucket with unchanged values)."""
    sign = F.when(
        F.col("change_type").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    return feed.groupBy(group_col).agg(
        F.sum(sign).alias("d_rows"),
        F.sum(sign * F.col(sum_col)).alias("d_sum"),
    )


def maintain_sum_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    *,
    key: str,
    group_col: str,
    sum_col: str,
    consumer_id: str = "matview",
    n_buckets: int = VIEW_BUCKETS,
) -> dict:
    """Run ONE maintenance cycle: consume the source's change feed
    after the view's recorded watermark and fold it into the per-group
    ``(n_rows, total)`` view table. Returns
    ``{"from_version", "to_version", "applied"}``.

    Exactly-once by construction: the consumed range and its data
    advance in one atomic view commit (module docstring) — there is no
    separate cursor to diverge from the data.
    """
    from .snapshot import (
        _collect_distinct_partitions,
        current_version,
        merge_snapshot,
        read_changes,
        read_manifest,
        read_snapshot,
    )

    _pin_n_buckets(view_path, n_buckets)
    latest = current_version(source_path)
    # ONE pinned read of the view manifest: watermark, existing rows,
    # and the commit's expected_version all derive from the same
    # version. Without the pin, a concurrent maintenance cycle (e.g.
    # CLI `matview` racing stream_sum_view) committing between the
    # watermark read and the existing-rows read would be re-read fresh
    # at commit time — no ConcurrentCommitError — and the overlapping
    # delta range folded in TWICE. Pinning makes any interleaved view
    # commit lose the optimistic race; the caller's retry re-reads
    # watermark + existing rows together.
    view_meta = read_manifest(view_path)
    view_parent = int(view_meta["version"])
    cur = int((view_meta.get("txn") or {}).get(consumer_id, 0))
    if cur >= latest:
        return {"from_version": cur, "to_version": latest, "applied": False}
    feed = read_changes(
        spark, source_path, since_version=cur, key=key, end_version=latest
    )
    delta = signed_delta(feed, group_col, sum_col).withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col(group_col)), F.lit(n_buckets)),
    )
    delta = delta.localCheckpoint(eager=False)
    view_parts = set(view_meta.get("partitions") or {})
    touched = {
        f"bucket={v}"
        for v in _collect_distinct_partitions(
            delta, "bucket", what="matview refresh"
        )
    }
    if touched & view_parts:
        existing = read_snapshot(
            spark,
            view_path,
            view_parent,
            partition_filter=lambda p: p in touched,
        ).select(group_col, "n_rows", "total")
    else:
        # empty or brand-new buckets only: no history to fold in.
        # Types follow the delta (pass an integral cents column for
        # engine-exact totals; doubles cancel only approximately).
        existing = delta.select(
            group_col,
            F.col("d_rows").alias("n_rows"),
            F.col("d_sum").alias("total"),
        ).limit(0)
    merged = delta.join(existing, group_col, "left").select(
        group_col,
        "bucket",
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows")).alias(
            "n_rows"
        ),
        (F.coalesce(F.col("total"), F.lit(0)) + F.col("d_sum")).alias(
            "total"
        ),
    )
    # A group whose rows all vanished stays as an n_rows=0 tombstone
    # (a partition-scoped MERGE cannot delete a key from its
    # bucket); readers filter n_rows > 0. This is data, not drift —
    # the tombstone's totals are exactly zero for integral columns.
    merge_snapshot(
        view_path,
        merged,
        group_col,
        "bucket",
        expected_version=view_parent,
        txn=(consumer_id, latest),
    )
    return {"from_version": cur, "to_version": latest, "applied": True}
