"""Data-quality gate: named validation rules → quarantine split.

The ingest-side pattern every large pipeline needs: declare rules as
named Catalyst boolean expressions, route failing rows to a dead-letter
side with the *reasons* attached (not just a drop count), keep the
clean side flowing. All expression-level — the rule evaluation is one
narrow map, codegen'd, no shuffle added.

NULL semantics: a rule that evaluates to NULL counts as a PASS here
(the ``F.when`` drops it), so rules must be written null-safely — e.g.
``col.isNotNull() & (col > 0)``, never bare ``col > 0`` — if NULL
should fail. This mirrors SQL WHERE semantics and is deliberate: an
explicit ``isNotNull`` rule reads as intent, an implicit NULL→fail
coercion hides it.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_flags(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Attach ``violations: array<string>`` — the names of every rule
    the row fails, in rule-declaration order (deterministic)."""
    checks = [F.when(~rule, F.lit(name)) for name, rule in rules.items()]
    return df.withColumn("violations", F.array_compact(F.array(*checks)))


def split_valid(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows passing every rule, and rows failing
    at least one — with ``violations`` naming the failures. Both sides
    derive from one flagged plan; Catalyst shares the scan."""
    flagged = violation_flags(df, rules)
    clean = flagged.filter(F.size("violations") == 0).drop("violations")
    quarantined = flagged.filter(F.size("violations") > 0)
    return clean, quarantined
