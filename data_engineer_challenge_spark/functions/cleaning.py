"""Text normalization (SURVEY.md §2.4 F1; reference exo_2.py:136-149)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """strip → collapse whitespace runs to one space → lowercase.

    Same observable behavior as the reference's ``normalize_text``
    (exo_2.py:136-149). Collapse runs *before* trimming: Spark ``trim``
    only strips spaces (not tabs/newlines), so edge runs are first
    collapsed to a single space, which trim then removes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
