"""Local replica of the driver's DuckDB-oracle comparison.

Stricter than the driver: exact value equality (the driver hashes
values order-insensitively; anything that passes here hash-matches).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from data_engineer_challenge_spark.schemas import TESTDATA_TABLES


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(v)
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = duckdb_oracle(sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    # dtype-family check: an int column on one side vs float on the
    # other hashes differently in the driver even when values compare
    # equal in Python (the round-1 DuckDB-HUGEINT lesson). Nullable int
    # columns widen to float on BOTH sides, so a genuine family split
    # only appears when neither side carries nulls.
    for c in got.columns:
        kinds = {got[c].dtype.kind, want[c].dtype.kind}
        if kinds == {"i", "f"} and not (got[c].isna().any() or want[c].isna().any()):
            raise AssertionError(
                f"dtype family mismatch on {c!r}: spark={got[c].dtype} "
                f"duckdb={want[c].dtype} (cast the oracle, e.g. HUGEINT→BIGINT)"
            )
    got_rows, want_rows = _canon(got), _canon(want)
    for i, (g, w) in enumerate(zip(got_rows, want_rows)):
        assert g == w, f"row {i} differs:\n  spark : {g}\n  duckdb: {w}"
