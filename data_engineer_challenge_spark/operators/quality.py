"""Data-quality expectation checks (SURVEY.md §2.9 — the engine-grade
replacement for the reference's log-and-continue error handling).

All expectations on a table evaluate in ONE aggregation pass (each
check is a conditional count), so a 100 TB table pays one scan for the
whole suite. Referential checks add one anti-join each.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    failed_rows: int
    total_rows: int

    @property
    def passed(self) -> bool:
        return self.failed_rows == 0


def run_checks(df: DataFrame, checks: dict[str, Column]) -> list[CheckResult]:
    """``checks`` maps name → boolean Column that must hold per row.
    One aggregation evaluates them all. A check that evaluates to NULL
    (e.g. ``col > 0`` on a null) counts as FAILED — three-valued ``~``
    would otherwise let null rows slip through the gate."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(name)
        for name, cond in checks.items()
    ]
    row = df.agg(*aggs).first()
    return [
        CheckResult(name=name, failed_rows=row[name], total_rows=row["__total"])
        for name in checks
    ]


def check_unique_key(df: DataFrame, keys: list[str]) -> CheckResult:
    """Key uniqueness needs a shuffle (one groupBy), not a self-join."""
    total = df.count()
    dupes = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("d"))
        .first()["d"]
    )
    return CheckResult(name=f"unique({','.join(keys)})", failed_rows=dupes, total_rows=total)


def check_referential(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> CheckResult:
    """Orphaned foreign keys via left-anti join."""
    total = child.count()
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)), on=fk, how="left_anti"
    ).count()
    return CheckResult(name=f"fk({fk}->{pk})", failed_rows=orphans, total_rows=total)


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Column-level profile (the ANALYZE / data-profiling surface):
    one row per column with ``n_rows, n_nulls, n_distinct, min_value,
    max_value`` (min/max computed in the column's own type, then
    rendered to string so the long format is uniform).

    ONE aggregation over the table computes every column's stats;
    the single result row is then unpivoted driver-side via
    ``stack`` (no second scan, no shuffle of data rows — the only
    exchange is the single-row aggregate's).

    ``exact=True`` uses exact multi-distinct, which Catalyst plans as
    an Expand (data duplicated once per distinct-column) — fine for
    profiling runs, and required for the SQL oracle. At 100 TB pass
    ``exact=False``: approx_count_distinct (HLL, ±5%) keeps the scan
    single-pass with bounded state and no Expand."""
    cols = columns or df.columns
    # positional internal aliases — profiled column names never enter
    # an identifier or SQL string, so any legal Spark name works
    # ("order date", "price-usd", "a.b", quotes, ...)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        # backtick-quote so "a.b" is one column, not struct access
        col = F.col(f"`{c.replace('`', '``')}`")
        nd = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            nd.alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__mn_{i}"),
            F.max(col).cast("string").alias(f"__mx_{i}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__nn_{i}").alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_value"),
                F.col(f"__mx_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(
        F.col("__n").alias("n_rows"), F.explode(entries).alias("e")
    ).select(
        F.col("e.column_name").alias("column_name"),
        "n_rows",
        F.col("e.n_nulls").alias("n_nulls"),
        F.col("e.n_distinct").alias("n_distinct"),
        F.col("e.min_value").alias("min_value"),
        F.col("e.max_value").alias("max_value"),
    )
