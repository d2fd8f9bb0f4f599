"""Scalar column-expression library (SURVEY.md §2.4 F1-F5, §2.2 P3-P13).

Every function here returns a ``pyspark.sql.Column`` built from
built-in JVM functions — no Python UDFs — so they stay inside
whole-stage codegen and cost nothing extra at 100 TB.
"""

from .cleaning import normalize_text
from .derive import death_code, document_origin_code, master_patient_flag
from .extraction import (
    extract_author,
    extract_document_date,
    filename_doc_id,
    filename_extension,
    filename_ipp,
    format_fr_date,
    parse_fr_date,
)

__all__ = [
    "normalize_text",
    "death_code",
    "document_origin_code",
    "master_patient_flag",
    "extract_author",
    "extract_document_date",
    "filename_doc_id",
    "filename_extension",
    "filename_ipp",
    "format_fr_date",
    "parse_fr_date",
]
