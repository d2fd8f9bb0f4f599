"""Conditional derivations (SURVEY.md §2.2 P3, P7, P13)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def death_code(death_date: Column | str) -> Column:
    """``'1'`` when a death date is present else ``'0'``
    (reference exo_1.py:74)."""
    return F.when(_c(death_date).isNotNull(), F.lit("1")).otherwise(F.lit("0"))


def master_patient_flag(hospital_patient_id: Column | str) -> Column:
    """1 when a hospital ID is present, else 0.

    Null-aware fix of the reference's truthiness check (exo_1.py:105),
    whose ``"0"`` branch was unreachable because a missing pandas cell
    is a truthy NaN under ``dtype=str`` (SURVEY §2.2 P7). Typed int per
    the DDL (the reference wrote the string ``"1"``).
    """
    c = _c(hospital_patient_id)
    return F.when(c.isNotNull() & (F.length(c) > 0), F.lit(1)).otherwise(F.lit(0))


def document_origin_code(extension: Column | str) -> Column:
    """File extension → source-system code (reference exo_2.py:242-247)."""
    ext = F.lower(_c(extension))
    return (
        F.when(ext == "pdf", F.lit("DOSSIER_PATIENT"))
        .when(ext == "docx", F.lit("RADIOLOGIE_SOFTWARE"))
        .otherwise(F.lit(None).cast("string"))
    )
