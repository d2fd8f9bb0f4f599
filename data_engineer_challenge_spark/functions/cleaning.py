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


def unicode_canonicalize(
    form: str = "NFKC", strip_controls: bool = True
) -> Column:
    """Column-function factory: Unicode canonicalization (UAX #15) of
    a string column — the standard pre-fingerprint step for web/OCR
    corpora, where the same visible text arrives as composed vs
    decomposed accents (é vs e+U+0301), ligatures (ﬁ), or full-width
    compatibility forms (Ａ１). Exact dedup, shingling, and token
    counts all silently fracture on such pairs until they are
    canonicalized; NFKC is the aggressive/recommended corpus form,
    NFC the conservative one.

    The JVM has no normalizer exposed through Spark SQL, so this is an
    Arrow-batched pandas UDF over ``unicodedata.normalize`` — a
    map-only pass, the same (single) Python boundary class as the
    extraction UDFs (SURVEY §4.3.3), never row-at-a-time.
    ``strip_controls`` additionally removes C0/C1 control characters
    except tab/newline (the PDF-extraction artifacts that poison
    shingles). Returns a ``Column`` function: apply as
    ``df.select(unicode_canonicalize()(F.col("text")))``."""
    import re as _re
    import unicodedata as _ud

    from pyspark.sql.functions import pandas_udf

    ctrl = _re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]")

    # no type hints on purpose: `from __future__ import annotations`
    # stringifies them, and pyspark's hint-based eval-type inference
    # cannot resolve 'pd.Series' against this module's locals — the
    # hintless form selects the scalar Arrow eval type directly
    @pandas_udf("string")
    def _norm(s):
        def one(v):
            if v is None:
                return None
            out = _ud.normalize(form, v)
            return ctrl.sub("", out) if strip_controls else out

        return s.map(one)

    return _norm
