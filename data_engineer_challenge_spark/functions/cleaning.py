"""Text normalization (SURVEY.md §2.4 F1; reference exo_2.py:136-149)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace as an EXPLICIT class, never ``\s``: Java's ``\s``
#: includes U+000B (vertical tab) while RE2's (DuckDB) does not, so a
#: ``\s`` shared between a Spark plan and its oracle SQL silently
#: diverges on \x0B-bearing text. This literal parses identically in
#: both engines; every oracle-paired regex in the package uses it.
WS_CLASS = r"[ \t\n\x0B\f\r]"


def normalize_text(col: Column | str) -> Column:
    """strip → collapse whitespace runs to one space → lowercase.

    Same observable behavior as the reference's ``normalize_text``
    (exo_2.py:136-149). Collapse runs *before* trimming: Spark ``trim``
    only strips spaces (not tabs/newlines), so edge runs are first
    collapsed to a single space, which trim then removes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, WS_CLASS + "+", " ")))
