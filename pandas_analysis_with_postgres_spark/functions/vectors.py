"""Vector expressions over ``array<float>`` embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the
math JVM-side; elements are cast to DOUBLE *before* multiplying and the
fold is strictly left-to-right, so the DuckDB oracle (sequential
``list_sum(list_transform(...))``) produces bit-identical doubles.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a partitioned scan of the corpus — no shuffle at all; the LSH
path (operators.similarity) trades exactness for a bucket-join.

Unrolling these folds at DIM=64 (the `_l2sq` trick that won at
length 4 in the PQ subspace loop) was MEASURED WORSE here: the
64-term expression trees (×3 per cosine) blow past whole-stage
codegen's method-size limits and the stage falls back to interpreted
mode wholesale — q27 0.68→2.2 s, q42 1.0→3.9 s, suite headline
15→21 s. Unroll short fixed-width folds only; keep wide ones as HOFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    """‖a‖₂ in double."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; denominator as sqrt(na)*sqrt(nb) — the same
    expression shape the oracle uses (order matters for bit-equality)."""
    return dot(a, b) / (norm(a) * norm(b))
