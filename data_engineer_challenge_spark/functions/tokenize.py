"""Tokenization shared by text analysis and near-dup dedup."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def word_tokens(col: Column | str) -> Column:
    """Lowercase word tokens (regex tokenizer, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)
