"""Scalar functions vs the reference's exact Python semantics.

The expected values are computed by a verbatim re-statement of the
reference's extract_metadata logic (exo_2.py:136-201) with the one
documented divergence: unparseable dates null out instead of raising
(SURVEY §2.4 F2).
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from data_engineer_challenge_spark.functions import (
    death_code,
    document_origin_code,
    extract_author,
    extract_document_date,
    filename_doc_id,
    filename_extension,
    filename_ipp,
    master_patient_flag,
    normalize_text,
)


def ref_normalize(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip()).lower()


def ref_extract_metadata(text: str):
    if not text:
        return None, None
    norm = ref_normalize(text)
    document_date = None
    for date_str in re.findall(r"\b\d{2}/\d{2}/\d{4}\b", norm):
        try:
            d = dt.datetime.strptime(date_str, "%d/%m/%Y")
        except ValueError:
            continue  # divergence: reference strptime would raise
        if d.year >= 2001:
            document_date = d.date()
            break
    author = None
    matches = re.findall(r"\b(dr)\s+([a-z]+(?:\s+[a-z]+)?)\b", norm)
    if matches:
        prefix, full_name = matches[-1]
        full_name = full_name.split("dr")[0]
        author = f"{prefix.capitalize()} {' '.join(w.capitalize() for w in full_name.split())}"
    return document_date, author


CASES = [
    "Né le 01/01/1940, consultation le 12/05/2018.\n\n Dr Mamy Nova",
    "compte rendu   du 14/02/2018 signé Dr Frank Einstein",
    "Dr PistouDr Penne, le 10/02/2015",
    "aucun docteur ici, juste une date 02/02/2002",
    "pas de date valable 99/99/2024 ni 31/12/1999, dr hassan",
    "dr a dr b dr c 05/06/2010",
    "multi  dr foo dr bar baz",  # greedy 2-word name then truncation
    "",
    "   \t \n  ",
    "DR  UPPER   CASE 11/11/2011",
    "le 29/02/2001 est invalide mais 28/02/2001 va",  # 2001 not a leap year
    "dr jean-pierre 03/03/2003",  # hyphen stops the name capture
    "word dr x",  # 1-letter name
    "drole de texte dr drake 04/04/2004",  # name starting with 'dr'
]


def test_extraction_matches_reference_semantics(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i long, text string")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            normalize_text("text").alias("norm"),
            extract_document_date("text").alias("doc_date"),
            extract_author("text").alias("author"),
        ).collect()
    }
    for i, text in enumerate(CASES):
        want_date, want_author = ref_extract_metadata(text)
        assert got[i]["norm"] == ref_normalize(text), f"norm case {i}"
        assert got[i]["doc_date"] == want_date, f"date case {i}: {text!r}"
        assert got[i]["author"] == want_author, f"author case {i}: {text!r}"


def test_golden_fixture_rows(spark):
    """Spot-check SURVEY/FIXTURES golden triples (FIXTURES.md §3 style)."""
    rows = spark.createDataFrame(
        [
            ("vu le 01/01/1940 puis le 12/05/2018 par dr mamy nova",),
            ("signé Dr Hu LoveDr Z le 01/10/2018",),
        ],
        "text string",
    ).select(
        extract_document_date("text").alias("d"), extract_author("text").alias("a")
    ).collect()
    assert rows[0]["d"] == dt.date(2018, 5, 12) and rows[0]["a"] == "Dr Mamy Nova"
    assert rows[1]["d"] == dt.date(2018, 10, 1) and rows[1]["a"] == "Dr Hu Love"


def test_filename_and_derives(spark):
    df = spark.createDataFrame(
        [
            ("00230580_321654.docx", "12/05/2018", "00230580"),
            ("15208032_937629.pdf", None, ""),
            ("17068044_89787.docx", "01/01/1999", None),
        ],
        "filename string, death string, hid string",
    )
    out = df.select(
        filename_ipp("filename").alias("ipp"),
        filename_doc_id("filename").alias("doc_id"),
        filename_extension("filename").alias("ext"),
        document_origin_code(filename_extension("filename")).alias("origin"),
        death_code(F.to_date("death", "dd/MM/yyyy")).alias("dc"),
        master_patient_flag("hid").alias("mpf"),
    ).collect()
    assert [r["ipp"] for r in out] == ["00230580", "15208032", "17068044"]
    assert [r["doc_id"] for r in out] == ["321654", "937629", "89787"]
    assert [r["ext"] for r in out] == ["docx", "pdf", "docx"]
    assert [r["origin"] for r in out] == [
        "RADIOLOGIE_SOFTWARE",
        "DOSSIER_PATIENT",
        "RADIOLOGIE_SOFTWARE",
    ]
    assert [r["dc"] for r in out] == ["1", "0", "1"]
    assert [r["mpf"] for r in out] == [1, 0, 0]
