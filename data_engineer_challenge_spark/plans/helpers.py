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
# Final results are rounded to scale 4 BEFORE the double cast: a
# decimal(38,10) whose scaled integer exceeds 2^53 converts to double
# with engine-dependent rounding (DuckDB's int128/10^scale division is
# not correctly rounded), while at scale 4 the scaled integer stays
# exact up to ~9e11 and both engines produce the identical double.
OUT = "decimal(38,4)"
OUT_SQL = "DECIMAL(38,4)"


def dec_sum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double
    (rounded to 4 decimal places — the declared result semantic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast(OUT).cast("double")


def dec_avg(col: Column | str) -> Column:
    """Order-independent mean of a double column, returned as double.

    The division happens in double on both engines (decimal division
    precision rules differ between Spark and DuckDB, double does not).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast(OUT).cast("double") / F.count(c)


def dec_sum_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`dec_sum` over SQL expression ``expr``.

    ``ROUND`` not ``CAST``: DuckDB's decimal downscale cast truncates,
    while ``ROUND(decimal, n)`` rounds half away from zero — matching
    Spark's HALF_UP cast.
    """
    return f"CAST(ROUND(SUM(CAST(({expr}) AS {DEC_SQL})), 4) AS DOUBLE)"


def dec_avg_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`dec_avg`."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS {DEC_SQL})), 4) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def bigint_sum_sql(expr: str) -> str:
    """DuckDB SUM over integers returns HUGEINT; Spark returns BIGINT."""
    return f"CAST(SUM({expr}) AS BIGINT)"


# ---------------------------------------------------------------------------
# Money arithmetic. A *product of doubles* carries ~15 significant
# digits, and Spark (shortest-string repr) vs DuckDB (exact binary
# expansion) round such doubles to decimal differently in the last
# digit. The testdata money/rate columns carry <= 2 decimal digits, so
# casting each FACTOR to a narrow decimal first recovers the exact
# value on both engines, and the multiplication itself is then exact
# decimal arithmetic — cross-engine deterministic at any scale.
# ---------------------------------------------------------------------------

MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def revenue_expr() -> Column:
    """lineitem revenue: price * (1 - discount), exact decimal."""
    return money("l_extendedprice") * (1 - F.col("l_discount")).cast(RATE)


def charge_expr() -> Column:
    """lineitem charge: price * (1 - discount) * (1 + tax), exact decimal."""
    return revenue_expr() * (1 + F.col("l_tax")).cast(RATE)


REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
CHARGE_SQL = f"({REVENUE_SQL}) * CAST(1 + l_tax AS DECIMAL(4,2))"


#: the DuckDB twin of :func:`md5_long` — ONE definition of the paired
#: SQL literal so the hex width / casting can never drift between an
#: engine expression and some module-local oracle copy (r11 review)
MD5_LONG_SQL = (
    "CAST(concat('0x', substr(md5(CAST({c} AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


def md5_long(col: Column | str) -> Column:
    """First 15 hex digits of md5(string(col)) as a 60-bit long — the
    engine-reproducible hash family every deterministic assignment in
    the registry uses (split/shard/sample membership, KMV, SimHash).
    One definition so the subtle construction (binary cast, 15 digits)
    cannot drift between call sites; the DuckDB twin is
    :data:`MD5_LONG_SQL`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


_SCRATCH_ROOT: list = []


def scratch_dir(prefix: str) -> str:
    """A temp directory for throwaway per-invocation artifacts (the
    index/table a registered query builds just to exercise its read
    path). All scratch dirs live under ONE process-scoped root that is
    removed at interpreter exit — without this, bench loops and the
    driver harness (which re-invoke builders many times per process)
    would leak a corpus copy into /tmp per call, since the returned
    DataFrames read the files lazily and per-call deletion is unsafe."""
    import atexit
    import shutil
    import tempfile

    if not _SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        _SCRATCH_ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT[0])
