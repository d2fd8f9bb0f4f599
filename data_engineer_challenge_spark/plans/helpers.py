"""Shared expression helpers for oracle-exact query results.

Why decimal: per-row arithmetic over doubles is bit-identical across
engines (IEEE 754), but *sums* of doubles depend on accumulation order,
which differs between Spark partitions and DuckDB. Casting each row
value to a wide decimal and summing exactly makes the aggregate
order-independent; the final cast back to double is then deterministic
on both sides. Shuffle/partial-agg behavior is unchanged — decimal sums
still combine map-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"
DEC_SQL = "DECIMAL(30,10)"


def dec_sum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dec_avg(col: Column | str) -> Column:
    """Order-independent mean of a double column, returned as double.

    The division happens in double on both engines (decimal division
    precision rules differ between Spark and DuckDB, double does not).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dec_sum_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`dec_sum` over SQL expression ``expr``."""
    return f"CAST(SUM(CAST(({expr}) AS {DEC_SQL})) AS DOUBLE)"


def dec_avg_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`dec_avg`."""
    return f"CAST(SUM(CAST(({expr}) AS {DEC_SQL})) AS DOUBLE) / COUNT({expr})"


def bigint_sum_sql(expr: str) -> str:
    """DuckDB SUM over integers returns HUGEINT; Spark returns BIGINT."""
    return f"CAST(SUM({expr}) AS BIGINT)"
