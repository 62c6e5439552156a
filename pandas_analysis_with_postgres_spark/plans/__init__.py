"""Query plans — the engine's declared capability surface.

``QUERIES`` maps query name → ``fn(spark, sf_dir) -> DataFrame``;
``ORACLES`` maps the same names → equivalent ANSI SQL for the DuckDB
differential harness (SURVEY §5.1). Queries whose semantics are not
SQL-expressible identically (streaming, LSH internals) are listed in
``QUERIES`` only — the driver then records a weaker rows-only check.
"""

from .analytics_queries import ANALYTICS_ORACLES, ANALYTICS_QUERIES
from .extension_queries import EXTENSION_ORACLES, EXTENSION_QUERIES
from .reference_queries import REFERENCE_ORACLES, REFERENCE_QUERIES
from .streaming_queries import STREAMING_ORACLES, STREAMING_QUERIES

QUERIES = {
    **REFERENCE_QUERIES,
    **EXTENSION_QUERIES,
    **ANALYTICS_QUERIES,
    **STREAMING_QUERIES,
}
ORACLES = {
    **REFERENCE_ORACLES,
    **EXTENSION_ORACLES,
    **ANALYTICS_ORACLES,
    **STREAMING_ORACLES,
}

__all__ = ["QUERIES", "ORACLES"]
