"""Pseudonymization / redaction column functions — the privacy tier.

The reference pipeline loads REAL patient identifiers (names, birth
dates, addresses, phone numbers: exo_1.py:57-82 writes them verbatim
into DWH_PATIENT) with no de-identification stage anywhere — for a
clinical data warehouse that is the loudest gap in its capability
envelope, and for a 100 TB training-data pipeline the same stage is
mandatory before text leaves the trust boundary. Everything here is a
pure column expression (JVM-side, map-only, no UDF):

- :func:`pseudonym` — salted SHA-256 of the identifier: stable across
  runs/engines (joins and dedup still work on the pseudonym), not
  reversible without the salt, replayable in any SQL engine with a
  sha256 function.
- :func:`mask_digits` — keep the trailing ``keep_last`` characters,
  replace every digit before them with ``X`` (phone/account shapes
  keep their routing suffix for support workflows).

Both compose with the k-anonymity audit (plans/cdw.py
``customers_k_anonymity``): pseudonymize direct identifiers, then
verify no quasi-identifier combination isolates fewer than k rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pseudonym(col: Column | str, salt: str) -> Column:
    """Salted SHA-256 pseudonym: deterministic (same input + salt →
    same token, so referential integrity survives de-identification),
    one-way without the salt. NULL stays NULL — an absent identifier
    must not collapse onto the pseudonym of the empty string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.sha2(F.concat(F.lit(salt), c), 256)
    )


def mask_digits(col: Column | str, keep_last: int = 4) -> Column:
    """Replace every digit with ``X`` except in the last ``keep_last``
    characters. Length-preserving (formatting punctuation survives),
    so downstream fixed-width parsers keep working on masked data."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    head = F.regexp_replace(
        F.substring(c, F.lit(1), n - F.lit(keep_last)), "[0-9]", "X"
    )
    tail = F.substring(c, n - F.lit(keep_last) + F.lit(1), F.lit(keep_last))
    return F.when(c.isNull(), F.lit(None).cast("string")).when(
        n <= F.lit(keep_last), c
    ).otherwise(F.concat(head, tail))
