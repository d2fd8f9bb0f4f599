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


# -- BPE tokenizer (frozen merges) -----------------------------------


def _ref_bpe_encode(word, merges):
    """Independently-written reference: apply merges IN TRAINING ORDER,
    each exhaustively — the original Sennrich formulation, which must
    agree with the rank-based inference loop in operators/bpe.py."""
    sym = list(word)
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [a + b]
            else:
                i += 1
    return sym


def test_bpe_train_golden_and_encode_agrees_with_reference():
    from data_engineer_challenge_spark.operators.bpe import (
        bpe_encode,
        train_bpe,
    )

    # hand-checkable corpus: 'low'x5, 'lower'x2, 'newest'x6, 'widest'x3
    # (the worked example from the BPE paper family)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 4)
    # s+t and e+s tie at 9; the deterministic tie-break takes the
    # lexicographically LARGER pair -> st; then e+st (9), then o+w
    # ((l,o)/(o,w) tie at 7), then l+ow (7) — hand-verified counts
    assert merges == [("s", "t"), ("e", "st"), ("o", "w"), ("l", "ow")]
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert bpe_encode("newest", ranks) == ["n", "e", "w", "est"]
    assert bpe_encode("lowest", ranks) == ["low", "est"]
    assert bpe_encode("low", ranks) == ["low"]
    assert bpe_encode("xyz", ranks) == ["x", "y", "z"]  # unseen chars

    # the rank-based inference equals the training-order reference on
    # every word of the frozen production table
    from data_engineer_challenge_spark.plans.bpe_merges import MERGES

    pranks = {tuple(m): i for i, m in enumerate(MERGES)}
    for w in ["shuffle", "partition", "aggregate", "window", "customer",
              "spark", "vector", "batch", "a", "q1", "x"]:
        assert bpe_encode(w, pranks) == _ref_bpe_encode(w, MERGES), w


def test_bpe_train_is_deterministic():
    from data_engineer_challenge_spark.operators.bpe import train_bpe

    freqs = {"abab": 3, "baba": 3, "aabb": 2}
    a = train_bpe(freqs, 5)
    b = train_bpe(dict(reversed(list(freqs.items()))), 5)
    assert a == b  # dict order must not leak into the merge list


def test_bpe_token_counts_spark_kernel(spark):
    from data_engineer_challenge_spark.operators.bpe import (
        bpe_encode,
        bpe_token_counts,
    )
    from data_engineer_challenge_spark.plans.bpe_merges import MERGES
    from data_engineer_challenge_spark.functions.tokenize import TOKEN_RE
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, MERGES).collect()
    }
    ranks = {tuple(m): i for i, m in enumerate(MERGES)}
    tok = re.compile(TOKEN_RE)
    for r in docs.select("doc_id", "text").limit(25).collect():
        ws = tok.findall(r["text"].lower())
        want = (len(ws), sum(len(bpe_encode(w, ranks)) for w in ws))
        assert got[r["doc_id"]] == want, r["doc_id"]
    # non-degenerate: subword tokens strictly exceed words somewhere
    assert any(b > w for w, b in got.values())


def test_bpe_distinct_tier_identical_to_memo_tier(spark):
    """The encode-distinct-then-join production tier must produce
    bit-identical rows to the per-task-memo kernel (same frozen merge
    table), including zero-word documents, and its plan must carry the
    scale shape: exactly ONE Python boundary (the distinct-word
    encoder), no driver collects."""
    from data_engineer_challenge_spark.operators.bpe import (
        bpe_token_counts,
        bpe_token_counts_distinct,
    )
    from data_engineer_challenge_spark.plans.bpe_merges import MERGES

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant a zero-word doc to pin the explode_outer path
    extra = spark.createDataFrame(
        [(999_999, "", "en", "synthetic", 0)], docs.schema
    )
    docs = docs.unionByName(extra)
    memo = {
        tuple(r) for r in bpe_token_counts(docs, MERGES).collect()
    }
    dist = {
        tuple(r)
        for r in bpe_token_counts_distinct(docs, MERGES).collect()
    }
    assert memo == dist
    assert (999_999, 0, 0, 0.0) in dist
    plan = (
        bpe_token_counts_distinct(docs, MERGES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1  # vocabulary-sized only


def test_bpe_merges_provenance_from_distributed_freqs(spark):
    """The frozen production merge table is REGENERABLE from the
    engine itself: distributed corpus word frequencies (one explode +
    one shuffle, vocabulary-bounded collect) fed to the deterministic
    trainer reproduce plans/bpe_merges.MERGES exactly — the
    offline-trained constant has executable provenance, not a story."""
    from data_engineer_challenge_spark.operators.bpe import (
        corpus_word_freqs,
        train_bpe,
    )
    from data_engineer_challenge_spark.plans.bpe_merges import MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    freqs = corpus_word_freqs(docs)
    assert train_bpe(freqs, 30) == MERGES
    # top_k truncation is deterministic and count-ordered
    top = corpus_word_freqs(docs, top_k=5)
    assert len(top) == 5
    assert min(top.values()) >= max(
        c for w, c in freqs.items() if w not in top
    )


def test_redaction_functions_edges(spark):
    """pseudonym: NULL stays NULL (no empty-string collision), stable
    across calls; mask_digits: short values pass through, punctuation
    survives, only the suffix keeps digits."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.functions.redaction import (
        mask_digits,
        pseudonym,
    )

    df = spark.createDataFrame(
        [("25-989-741-2988",), ("123",), (None,)], "v string"
    )
    rows = df.select(
        pseudonym("v", "s").alias("p"), mask_digits("v", 4).alias("m")
    ).collect()
    full, short, null = rows
    assert full["m"] == "XX-XXX-XXX-2988"
    assert short["m"] == "123"          # <= keep_last: unchanged
    assert null["p"] is None and null["m"] is None
    again = df.select(pseudonym("v", "s").alias("p")).collect()
    assert [r["p"] for r in again] == [r["p"] for r in rows]
    # different salt, different universe
    other = df.select(pseudonym("v", "t").alias("p")).collect()
    assert other[0]["p"] != full["p"]


def test_unicode_canonicalize_nfkc_and_controls(spark):
    """NFKC folds decomposed accents, ligatures, and full-width
    compatibility forms onto the canonical codepoints exact-dedup and
    shingling need; C0/C1 controls (PDF-extraction artifacts) strip,
    tab/newline survive, nulls pass through."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.functions.cleaning import (
        unicode_canonicalize,
    )

    decomposed = "café"  # e + combining acute
    rows = [
        (decomposed,),
        ("café",),  # composed form of the same text
        ("ﬁne Ａ１",),  # ligature fi + fullwidth A1
        ("a\x00b\x9fc\td\ne",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string")
    out = [
        r["n"]
        for r in df.select(unicode_canonicalize()(F.col("t")).alias("n")).collect()
    ]
    assert out[0] == out[1] == "café"  # the dedup-fracture case healed
    assert out[2] == "fine A1"
    assert out[3] == "abc\td\ne"
    assert out[4] is None
    # conservative NFC keeps compatibility characters distinct
    nfc = [
        r["n"]
        for r in df.select(
            unicode_canonicalize(form="NFC")(F.col("t")).alias("n")
        ).collect()
    ]
    assert nfc[0] == "café" and nfc[2] == "ﬁne Ａ１"
