"""Seeded-random fuzz: the Spark extraction expressions must agree with
the verbatim Python reference semantics on generated text (one batched
DataFrame pass — fast and deterministic)."""

from __future__ import annotations

import random

from data_engineer_challenge_spark.functions import (
    extract_author,
    extract_document_date,
    normalize_text,
)

from .test_functions import ref_extract_metadata, ref_normalize

WORDS = [
    "dr", "docteur", "le", "patient", "vu", "compte", "rendu", "radio",
    "alpha", "beta", "gamma", "pistou", "penne", "drake", "andre", "x",
    "consultation", "ne", "signe", "service",
]
DATES = [
    "01/01/1940", "12/05/2018", "29/02/2001", "31/12/2000", "01/01/2001",
    "99/99/2024", "00/10/2015", "15/13/2010", "28/02/2024", "5/5/2005",
]
JUNK = ["\t", "\n", "  ", ",", ".", "(", ")", "-", "12345", "UPPER", "Mixed"]


def _gen(rng: random.Random) -> str:
    n = rng.randint(0, 25)
    parts = []
    for _ in range(n):
        bucket = rng.random()
        if bucket < 0.55:
            parts.append(rng.choice(WORDS))
        elif bucket < 0.8:
            parts.append(rng.choice(DATES))
        else:
            parts.append(rng.choice(JUNK))
    sep = rng.choice([" ", "  ", " \n "])
    return sep.join(parts)


def test_fuzz_extraction_agrees_with_reference(spark):
    rng = random.Random(42)
    cases = [_gen(rng) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, text string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            normalize_text("text").alias("norm"),
            extract_document_date("text").alias("d"),
            extract_author("text").alias("a"),
        ).collect()
    }
    mismatches = []
    for i, text in enumerate(cases):
        want_d, want_a = ref_extract_metadata(text)
        if got[i]["norm"] != ref_normalize(text):
            mismatches.append((i, "norm", text))
        if got[i]["d"] != want_d:
            mismatches.append((i, "date", text, got[i]["d"], want_d))
        if got[i]["a"] != want_a:
            mismatches.append((i, "author", text, got[i]["a"], want_a))
    assert not mismatches, mismatches[:5]
