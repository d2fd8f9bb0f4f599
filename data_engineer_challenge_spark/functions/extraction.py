"""Regex/date extraction (SURVEY.md §2.4 F2-F5, §2.2 P12).

Faithful Spark-SQL re-expressions of the reference's metadata
extractor (exo_2.py:166-201): no Python in the hot path — these run
inside whole-stage codegen over the normalized text column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cleaning import WS_CLASS, normalize_text

_DATE_PATTERN = r"\b\d{2}/\d{2}/\d{4}\b"
# author: "dr" then a 1- or 2-word lowercase name (reference
# exo_2.py:191); WS_CLASS not \s — see cleaning.WS_CLASS
_AUTHOR_PATTERN = rf"\b(dr){WS_CLASS}+([a-z]+(?:{WS_CLASS}+[a-z]+)?)\b"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_fr_date(col: Column | str) -> Column:
    """``DD/MM/YYYY`` string → DateType, null when unparseable.

    ``try_to_date`` rather than ``to_date``: the reference's
    ``strptime`` would crash the whole batch on an invalid date like
    ``99/99/2024`` (SURVEY §2.4 F2 caveat); null-and-skip is the
    sane distributed semantic.
    """
    return F.try_to_date(_c(col), "dd/MM/yyyy")


def format_fr_date(col: Column | str) -> Column:
    """DateType → ``dd/MM/yyyy`` presentation string (exo_1.py:75)."""
    return F.date_format(_c(col), "dd/MM/yyyy")


def extract_document_date(text: Column | str, min_year: int = 2001) -> Column:
    """First ``DD/MM/YYYY`` date with year >= ``min_year`` in the
    normalized text, as DateType (reference exo_2.py:181-189).

    Skipping pre-2001 dates drops birth dates that precede the real
    document date (FIXTURES.md §3, e.g. 00230580_321654.docx).
    """
    dates = F.regexp_extract_all(normalize_text(text), F.lit(_DATE_PATTERN), 0)
    valid = F.filter(
        dates, lambda d: F.year(F.try_to_date(d, "dd/MM/yyyy")) >= min_year
    )
    # F.get is null-safe on the empty array (element_at raises under ANSI)
    return F.try_to_date(F.get(valid, 0), "dd/MM/yyyy")


def extract_author(text: Column | str) -> Column:
    """Last ``dr <name>`` mention, title-cased as ``Dr X [Y]``; null
    when absent (reference exo_2.py:191-199).

    Reference quirks preserved: the *last* regex match wins; the
    captured name is truncated at an embedded ``dr`` (handles
    concatenated DOCX textbox runs like ``pistoudr penne`` → ``pistou``,
    exo_2.py:196); ``initcap`` equals Python ``str.capitalize`` on the
    lowercase-alpha tokens the pattern can produce.
    """
    names = F.regexp_extract_all(normalize_text(text), F.lit(_AUTHOR_PATTERN), 2)
    last = F.get(names, F.size(names) - 1)  # null when no match
    truncated = F.get(F.split(last, "dr"), 0)
    # trim+collapse mirrors the reference's `' '.join(name.split())`
    # (a name like "foo dr" truncates to "foo " — trailing space must go)
    tidy = F.regexp_replace(F.trim(truncated), WS_CLASS + "+", " ")
    return F.when(
        last.isNotNull(), F.concat(F.lit("Dr "), F.initcap(tidy))
    ).otherwise(F.lit(None).cast("string"))


# --- filename convention `<IPP>_<ID_DOC_SOURCE>.<ext>` (exo_2.py:238-239) ---


def filename_ipp(filename: Column | str) -> Column:
    """Text before the first ``_`` (the hospital patient ID)."""
    return F.regexp_extract(_c(filename), r"^([^_]+)_", 1)


def filename_doc_id(filename: Column | str) -> Column:
    """Second ``_``-separated token, extension stripped — mirrors the
    reference's ``split('_')[1].split('.')[0]``."""
    return F.regexp_extract(_c(filename), r"^[^_]+_([^_.]+)", 1)


def filename_extension(filename: Column | str) -> Column:
    """Lowercased extension after the final dot."""
    return F.lower(F.regexp_extract(_c(filename), r"\.([A-Za-z0-9]+)$", 1))
