"""Bucketized range (interval-containment) join (pyspark guide: common
OLAP patterns — Spark has no native range join; a naive inequality
join becomes BroadcastNestedLoop or a cartesian).

Trick: quantize the range dimension into fixed-width buckets. Each
interval explodes into the buckets it covers; each point maps to one
bucket; an *equi-join* on (bucket [+ keys]) finds candidates and an
exact containment filter finishes. Both sides stay distributed — the
shuffle is an ordinary hash join on the bucket id, so this survives
two billion-row sides where nested-loop cannot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` joined to every interval with
    ``lo <= point < hi`` (optionally also matching ``keys``).

    Inner-join only: the containment filter runs after the bucket
    equi-join, so an outer ``how`` would null-extend unmatched rows
    and then silently drop them in the filter — degrading to inner
    while claiming otherwise. Outer range-join semantics need an
    explicit anti-join union; raise rather than lie."""
    if how != "inner":
        raise ValueError(
            f"bucketed_range_join how={how!r}: only 'inner' is "
            "supported — an outer join's null-extended rows would be "
            "dropped by the containment filter; union a left_anti of "
            "the matched point ids for outer semantics"
        )
    if not bucket_width > 0:  # also rejects NaN
        raise ValueError(
            f"bucketed_range_join bucket_width={bucket_width!r}: must "
            "be a positive finite width — division by zero/NaN yields "
            "NULL buckets and a silently empty join"
        )

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    p = points.withColumn("__bucket", bucket_of(F.col(point_col)))
    # bucket_of(hi) unconditionally: an epsilon like hi - 1e-9 drops a
    # valid match when a bucket boundary lands inside (hi-eps, hi) and
    # is absorbed entirely for hi ≳ 1e7 in doubles — one extra
    # candidate bucket per interval is removed by the exact filter.
    # Empty/inverted intervals (hi <= lo) must emit NO buckets:
    # sequence(start, stop) steps BACKWARD when start > stop, so a
    # degenerate interval would otherwise explode into a huge
    # descending bucket array instead of the zero matches the
    # containment filter implies.
    iv = intervals.filter(F.col(lo_col) < F.col(hi_col)).withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(F.col(lo_col)), bucket_of(F.col(hi_col)))),
    )
    joined = p.join(iv, [*keys, "__bucket"], how)
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    ).drop("__bucket")
