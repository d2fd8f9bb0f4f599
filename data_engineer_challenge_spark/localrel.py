"""Driver-local rows → JVM local-relation DataFrames (r14, guide §4).

``spark.createDataFrame(list_of_tuples)`` parallelizes the rows into a
pickled Python RDD of ``defaultParallelism`` slices: every action that
executes the resulting scan pays Python-worker rounds to deserialize
them. Measured on this repo's local[32] session: a ONE-ROW frame costs
~5 s inside a write job (a single output task pulls all 32 pickled
slices serially through one Python worker) and ~0.5 s under a parallel
action — pure JVM↔Python boundary cost for data that never needed to
leave the driver.

Routing the same rows through pandas turns them into an Arrow-backed
JVM ``LocalRelation``: no Python workers at action time, ~0.17 s for
the same write, and the frame behaves identically downstream
(broadcast builds, joins, unions). Column mapping is positional
against the given schema, ``None`` maps to NULL, arrays pass through,
and empty row lists are legal — pinned by tests/test_operators.py.

Use this for every driver-side fixture/metadata frame that feeds a
plan (stats rows, centroid tables, query-term lists, weight tables).
NOT for data that is genuinely distributed — this materializes all
rows on the driver by construction.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[tuple] | list[tuple],
    schema: str | T.StructType,
) -> DataFrame:
    """A DataFrame over driver-local ``rows`` backed by a JVM
    LocalRelation (via pandas/Arrow), not a pickled Python RDD.

    ``rows`` are tuples mapped POSITIONALLY onto ``schema``'s fields —
    the same contract ``spark.createDataFrame(rows, schema)`` applies
    to tuples, so call sites swap in place.

    Value semantics (r15 ADVICE): the r14 pandas route silently turned
    float NaN into NULL (pyarrow's from_pandas treats NaN as missing),
    so a NaN weight/score computed from numpy would drop out of join
    arithmetic where ``createDataFrame(list)`` propagated it. Columns
    now build through ``pyarrow.array`` over the raw Python values
    (NaN is a VALUE there, None is the only null), so the helper
    matches the row-list semantics for floats too. Types the arrow
    columnizer can't take (e.g. struct fields given as tuples) fall
    back to the pandas route, which refuses rows containing NaN
    instead of corrupting them."""
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    names = [f.name for f in st.fields]
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        asch = to_arrow_schema(st)
        cols = (
            list(zip(*rows)) if rows else [() for _ in st.fields]
        )
        tbl = pa.Table.from_arrays(
            [
                pa.array(list(c), type=f.type)
                for c, f in zip(cols, asch)
            ],
            schema=asch,
        )
        return spark.createDataFrame(tbl, schema=st)
    except (pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError, ValueError, TypeError):
        pass
    import math

    import pandas as pd

    if any(
        isinstance(v, float) and math.isnan(v)
        for row in rows
        for v in row
    ):
        raise ValueError(
            "local_rows_df fallback (pandas) would convert float NaN "
            "to NULL — pass None for nulls, or keep the column "
            "arrow-columnizable so NaN survives as a value"
        )
    pdf = (
        pd.DataFrame(rows, columns=names)
        if rows
        else pd.DataFrame({n: [] for n in names})
    )
    return spark.createDataFrame(pdf, schema=st)
