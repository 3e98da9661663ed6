"""Scalar/aggregate helper functions shared by the query corpus.

Cross-engine determinism helpers
--------------------------------
The correctness harness hash-compares Spark results against a DuckDB
oracle. Floating-point **sums** are order-dependent (Spark aggregates
per-partition, DuckDB sequentially), so money-style sums are computed
in exact decimal arithmetic and cast back to double — bit-identical in
any evaluation order. Normalized statistics (avg/stddev/corr/
percentile) have O(eps·sqrt(n)) error, so rounding to 4-6 decimals is
stable; raw per-row arithmetic is IEEE-deterministic and needs no
rounding at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent sum of a money-like column.

    Casts each element to ``decimal(precision, scale)`` (exact), sums in
    decimal (exact, associative), and casts the result to double. The
    DuckDB-equivalent SQL is produced by :func:`dsum_sql`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """ANSI-SQL mirror of :func:`dsum` for the DuckDB oracle."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent mean: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


def davg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def is_infinite(col: Column | str) -> Column:
    """Polars ``is_infinite`` equivalent (reference examples use it to
    mask bad float data; Spark has isnan/isNull but no isinf builtin)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c == float("inf")) | (c == float("-inf"))


def is_finite(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ~(F.isnan(c) | is_infinite(c)) & c.isNotNull()
