"""Grouped custom Python via ``applyInPandas`` (Arrow-batched).

The batch sibling of ``streaming.stateful_user_counts``
(applyInPandasWithState) and ``multimodal.featurize_media``
(mapInPandas): one group's rows arrive as a pandas DataFrame, the
return frame is Arrow-encoded back. This is the escape hatch for
per-group logic Catalyst can't express (custom numerics, model
scoring); everything expressible as built-ins should stay JVM-side —
the plan pins in tests/test_plans.py enforce exactly that for every
other oracled query.

Scale: groups shuffle to executors by key (same cost as groupBy);
a single giant group is the hazard — the whole group materializes in
one worker's memory. Guard keys with bounded cardinality-per-key, or
pre-aggregate.

Determinism note: the demo op is an exact *median over integers* —
numpy's interpolated median of BIGINTs is exactly representable
(x.0 / x.5), so even this Python-side result hash-matches the SQL
oracle; a float *sum* would not (pandas accumulates in array order).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIAN_SCHEMA = "event_type string, day long, n_events long, median_cents double"


def _median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "day": [pdf["day"].iloc[0]],
            "n_events": [len(pdf)],
            "median_cents": [float(pdf["cents"].median())],
        }
    )


def grouped_median_cents(events: DataFrame) -> DataFrame:
    """Exact median of floor(value·100) per (event_type, day), in
    pandas per group — the applyInPandas surface demonstrator.

    Group key choice is the whole performance story for this API: the
    function runs once per group, so per-user keys (~10 rows/group)
    drown in per-call overhead (measured 4.9 s at sf0.1), while one
    global group serializes onto a single worker. event_type × day is
    the medium-cardinality shape the operator is FOR (3.7 s at sf0.1;
    the residual vs a ~0.3 s JVM percentile is Python worker spin-up
    plus Arrow transfer — the price of the escape hatch, which is why
    every other oracled plan stays JVM-side).
    """
    cents = F.floor(F.col("value") * 100).cast("long")
    day = F.unix_date(F.col("ts").cast("date")).cast("long")
    return (
        events.select("event_type", day.alias("day"), cents.alias("cents"))
        .groupBy("event_type", "day")
        .applyInPandas(_median_fn, MEDIAN_SCHEMA)
    )


def arrow_value_spread(events: DataFrame) -> DataFrame:
    """Per-user value profile through the ARROW-NATIVE Python quadrant
    — ``applyInArrow`` for the grouped reduction, ``mapInArrow`` for
    the narrow post-map — completing the boundary matrix next to
    pandas_udf / applyInPandas / mapInPandas / applyInPandasWithState /
    UDTF. pyarrow.Table in, pyarrow.Table out: no pandas conversion on
    either edge, which is the entire point of the API — for
    numeric-kernel work the pandas layer only adds a copy and dtype
    coercions on top of the Arrow buffers Spark already speaks.

    The group-key guidance from :func:`grouped_median_cents` applies
    unchanged (per-group call overhead; giant groups materialize in
    one worker). Determinism: min/max/count over doubles are
    order-independent, so the result hash-matches the SQL oracle — a
    float sum would not.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def spread(table: pa.Table) -> pa.Table:
        v = table.column("value")
        return pa.table(
            {
                "user_id": pa.array(
                    [table.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_events": pa.array([table.num_rows], pa.int64()),
                "lo": pa.array([pc.min(v).as_py()], pa.float64()),
                "hi": pa.array([pc.max(v).as_py()], pa.float64()),
            }
        )

    def widen(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            yield from t.append_column(
                "spread",
                pc.subtract(t.column("hi"), t.column("lo")),
            ).to_batches()

    grouped = (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInArrow(
            spread, "user_id long, n_events long, lo double, hi double"
        )
    )
    return grouped.mapInArrow(
        widen,
        "user_id long, n_events long, lo double, hi double, spread double",
    )
