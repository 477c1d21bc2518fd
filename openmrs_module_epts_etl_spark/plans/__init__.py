"""Query library exposed through ``__spark_entry__.py``.

Every entry pairs a Spark DataFrame implementation with an ANSI-SQL oracle
string (DuckDB-runnable) producing identical column names and values; ops
whose building blocks aren't expressible in portable SQL (xxhash64-based
signatures, pandas-UDF LSH) ship without an oracle and get the driver's
rows-only check.
"""

from .registry import (
    IN_REPO_ONLY_ORACLES,
    IN_REPO_ONLY_QUERIES,
    ORACLES,
    QUERIES,
    flagship,
)

__all__ = [
    "QUERIES",
    "ORACLES",
    "IN_REPO_ONLY_QUERIES",
    "IN_REPO_ONLY_ORACLES",
    "flagship",
]
