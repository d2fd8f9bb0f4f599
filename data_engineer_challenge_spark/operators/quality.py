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
