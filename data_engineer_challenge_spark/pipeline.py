"""The two reference entry-point dataflows as composable Spark plans
(SURVEY.md §3): patient registry load and clinical document load.

Differences from the reference, all deliberate (SURVEY §2.2/§2.5):
- keep-first dedup and dense IDs use explicit source order
  (``__row_idx``) instead of pandas index order;
- ``PATIENT_NUM`` is gap-free after dedup (the reference leaves gaps);
- ``DOCUMENT_NUM`` is stable across runs: keyed rows keep their number,
  new rows extend the sequence (the reference renumbers from listdir
  order every run — upsert hazard K3);
- ``MASTER_PATIENT_ID`` is a null-aware int (reference wrote str with
  an unreachable '0' branch, exo_1.py:105);
- per-document point lookups are one broadcast hash join (S6→J4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import (
    death_code,
    document_origin_code,
    extract_author,
    extract_document_date,
    filename_doc_id,
    filename_extension,
    filename_ipp,
    master_patient_flag,
    parse_fr_date,
)
from .operators.dedup import keep_first_dedup
from .operators.ids import dense_ids, extend_ids
from .operators.joins import anti_join, lookup_join
from .operators.merge import ParquetWarehouse
from .schemas import DWH_DOCUMENT, DWH_PATIENT, DWH_PATIENT_IPPHIST

PATIENT_DEDUP_KEYS = ["NOM", "PRENOM", "DATE_NAISSANCE", "ADRESSE", "TEL"]

def _null_str():
    # built lazily: constructing a Column requires an active SparkContext
    return F.lit(None).cast("string")


def shape_patients(registry: DataFrame, upload_id: int) -> tuple[DataFrame, DataFrame]:
    """Registry rows (+ ``__row_idx``) → (DWH_PATIENT, DWH_PATIENT_IPPHIST).

    One deduped scan, two projections (SURVEY P1+P2 share a scan via
    cache instead of the reference's double iterrows, exo_1.py:123-131).
    """
    deduped = keep_first_dedup(registry, PATIENT_DEDUP_KEYS, ["__row_idx"])
    with_ids = dense_ids(deduped, "PATIENT_NUM", ["__row_idx"]).cache()

    patient = with_ids.select(
        "PATIENT_NUM",
        F.col("NOM").alias("LASTNAME"),
        F.col("PRENOM").alias("FIRSTNAME"),
        parse_fr_date("DATE_NAISSANCE").alias("BIRTH_DATE"),
        F.col("SEXE").alias("SEX"),
        F.col("NOM_JEUNE_FILLE").alias("MAIDEN_NAME"),
        F.col("ADRESSE").alias("RESIDENCE_ADDRESS"),
        F.col("TEL").alias("PHONE_NUMBER"),
        F.col("CP").alias("ZIP_CODE"),
        F.col("VILLE").alias("RESIDENCE_CITY"),
        parse_fr_date("DATE_MORT").alias("DEATH_DATE"),
        F.col("PAYS").alias("RESIDENCE_COUNTRY"),
        _null_str().alias("RESIDENCE_LATITUDE"),
        _null_str().alias("RESIDENCE_LONGITUDE"),
        death_code(parse_fr_date("DATE_MORT")).alias("DEATH_CODE"),
        F.current_date().alias("UPDATE_DATE"),
        _null_str().alias("BIRTH_COUNTRY"),
        _null_str().alias("BIRTH_CITY"),
        _null_str().alias("BIRTH_ZIP_CODE"),
        F.lit(None).cast("double").alias("BIRTH_LATITUDE"),
        F.lit(None).cast("double").alias("BIRTH_LONGITUDE"),
        F.lit(upload_id).cast("long").alias("UPLOAD_ID"),
    )
    ipphist = with_ids.select(
        "PATIENT_NUM",
        "HOSPITAL_PATIENT_ID",
        F.lit("SIH").alias("ORIGIN_PATIENT_ID"),
        master_patient_flag("HOSPITAL_PATIENT_ID").alias("MASTER_PATIENT_ID"),
        F.lit(upload_id).cast("long").alias("UPLOAD_ID"),
    )
    return patient, ipphist


def shape_documents(
    files: DataFrame, ipphist: DataFrame, upload_id: int, start_doc_num: int = 0
) -> tuple[DataFrame, DataFrame]:
    """(filename, text) rows → (DWH_DOCUMENT rows, rejects).

    Rejects = readable documents whose IPP matches no patient — the
    reference logs a warning and drops them (exo_2.py:255-258); here
    they come back as a DataFrame branch for a quarantine sink.
    """
    parsed = (
        files.filter(F.col("text").isNotNull() & (F.col("text") != ""))  # P10
        .withColumn("HOSPITAL_PATIENT_ID", filename_ipp("filename"))
        .withColumn("ID_DOC_SOURCE", filename_doc_id("filename"))
        .withColumn("DOCUMENT_TYPE", filename_extension("filename"))
    )
    lookup = ipphist.select("HOSPITAL_PATIENT_ID", "PATIENT_NUM")
    matched = lookup_join(parsed, lookup, on="HOSPITAL_PATIENT_ID", how="inner")
    rejects = anti_join(parsed, lookup, on="HOSPITAL_PATIENT_ID").select(
        "filename", "HOSPITAL_PATIENT_ID"
    )

    numbered = extend_ids(
        matched, "DOCUMENT_NUM", start_doc_num, ["HOSPITAL_PATIENT_ID", "ID_DOC_SOURCE"]
    )
    docs = numbered.select(
        "DOCUMENT_NUM",
        "PATIENT_NUM",
        _null_str().alias("ENCOUNTER_NUM"),
        _null_str().alias("TITLE"),
        document_origin_code("DOCUMENT_TYPE").alias("DOCUMENT_ORIGIN_CODE"),
        extract_document_date("text").alias("DOCUMENT_DATE"),
        "ID_DOC_SOURCE",
        "DOCUMENT_TYPE",
        F.col("text").alias("DISPLAYED_TEXT"),
        extract_author("text").alias("AUTHOR"),
        _null_str().alias("UNIT_CODE"),
        F.lit(None).cast("int").alias("UNIT_NUM"),
        F.lit(None).cast("int").alias("DEPARTMENT_NUM"),
        F.lit(0).alias("EXTRACTCONTEXT_DONE_FLAG"),
        F.lit(0).alias("EXTRACTCONCEPT_DONE_FLAG"),
        F.lit(0).alias("ENRGENE_DONE_FLAG"),
        F.lit(0).alias("ENRICHTEXT_DONE_FLAG"),
        F.current_date().alias("UPDATE_DATE"),
        F.lit(upload_id).cast("long").alias("UPLOAD_ID"),
    )
    return docs, rejects


# ---------------------------------------------------------------------------
# Batch entry points (SURVEY §3 entry points 1 and 2)
# ---------------------------------------------------------------------------


def run_patient_batch(wh: ParquetWarehouse, registry: DataFrame, upload_id: int) -> None:
    """Entry point 1 (exo_1.py:173-214): shape + MERGE both tables."""
    patient, ipphist = shape_patients(registry, upload_id)
    wh.merge_upsert("DWH_PATIENT", patient, ["PATIENT_NUM"])
    wh.merge_upsert("DWH_PATIENT_IPPHIST", ipphist, ["PATIENT_NUM", "HOSPITAL_PATIENT_ID"])


def run_document_batch(
    wh: ParquetWarehouse, files: DataFrame, upload_id: int
) -> DataFrame:
    """Entry point 2 (exo_2.py:311-339): extract, resolve patients,
    number stably, MERGE on the business key. Returns the rejects.

    Stable numbering: rows whose (PATIENT_NUM, ID_DOC_SOURCE) already
    exist keep their DOCUMENT_NUM; genuinely new rows continue the
    sequence from the current max.
    """
    ipphist = wh.read("DWH_PATIENT_IPPHIST", DWH_PATIENT_IPPHIST)
    docs, rejects = shape_documents(files, ipphist, upload_id)

    bk = ["PATIENT_NUM", "ID_DOC_SOURCE"]
    if wh.exists("DWH_DOCUMENT"):
        existing = wh.read("DWH_DOCUMENT", DWH_DOCUMENT)
        start = existing.agg(F.max("DOCUMENT_NUM")).first()[0] or 0
        known = existing.select(*bk, F.col("DOCUMENT_NUM").alias("__keep_num"))
        src = docs.drop("DOCUMENT_NUM")
        kept = (
            src.join(F.broadcast(known), bk, "inner")
            .withColumnRenamed("__keep_num", "DOCUMENT_NUM")
        )
        fresh = extend_ids(
            anti_join(src, known, bk), "DOCUMENT_NUM", start, bk
        )
        docs = kept.unionByName(fresh).select(*[f.name for f in DWH_DOCUMENT.fields])
    wh.merge_upsert("DWH_DOCUMENT", docs, bk)
    return rejects
