"""CDW-parity queries (SURVEY.md §2.2 P12-P13, §2.4 F1-F5) with DuckDB
oracles.

The clinical corpus itself isn't part of the driver's testdata, so
these queries graft the reference's extraction semantics onto the
``documents`` table: text is augmented with *deterministic* markers
(a decoy pre-2001 date, a real date whose year varies per row, an
author tag) computed identically in both engines, then the exact
normalize/date/author expressions run over it. This puts F1-F3 under
the driver's hash-compare, complementing the golden-corpus pipeline
tests in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    document_origin_code,
    extract_author,
    extract_document_date,
    filename_doc_id,
    filename_extension,
    filename_ipp,
    format_fr_date,
    normalize_text,
)
from ..tables import load_table
from . import register

# augmented text: decoy 1940 date + per-row year (some < 2001 → must be
# skipped) + author marker built from lang ('dr en' etc.)
_AUG_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("ne le 01/01/1940 "),
    F.col("text"),
    F.lit(" compte rendu du 12/05/"),
    (1995 + F.col("doc_id") % 20).cast("string"),
    F.lit(" signe dr "),
    F.col("lang"),
)
_AUG_SQL = (
    "'ne le 01/01/1940 ' || text || ' compte rendu du 12/05/' || "
    "CAST(1995 + doc_id % 20 AS VARCHAR) || ' signe dr ' || lang"
)

from ..functions.cleaning import WS_CLASS as _WS  # \s diverges Java/RE2

_NORM_SQL = f"trim(regexp_replace(lower({{t}}), '{_WS}+', ' ', 'g'))"


@register(
    "cdw_normalize_text",
    oracle=f"""
    SELECT doc_id, {_NORM_SQL.format(t='text')} AS norm
    FROM documents
    """,
)
def cdw_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: strip → collapse whitespace → lowercase (exo_2.py:136-149)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_text("text").alias("norm"))


@register(
    "cdw_document_date_extraction",
    oracle=f"""
    SELECT doc_id,
           try_strptime(
               list_filter(
                   regexp_extract_all({_NORM_SQL.format(t=_AUG_SQL)},
                                      '\\b\\d{{2}}/\\d{{2}}/\\d{{4}}\\b'),
                   d -> year(try_strptime(d, '%d/%m/%Y')) >= 2001
               )[1], '%d/%m/%Y') AS document_date
    FROM documents
    """,
)
def cdw_document_date_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: first dd/MM/yyyy with year >= 2001; the 1940 decoy and the
    1995-2000 rows must yield NULL (exo_2.py:181-189).

    Result surfaced as timestamp: a DATE column round-trips through
    pandas differently per engine (datetime.date vs datetime64), which
    would break the driver's value-hash even for equal dates."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        extract_document_date(_AUG_SPARK()).cast("timestamp").alias("document_date"),
    )


@register(
    "cdw_author_extraction",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               regexp_extract_all({_NORM_SQL.format(t=_AUG_SQL)},
                                  '\\b(dr){_WS}+([a-z]+(?:{_WS}+[a-z]+)?)\\b',
                                  2) AS names
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(names) > 0 THEN
               'Dr ' || array_to_string(
                   list_transform(
                       string_split(trim(regexp_replace(
                           string_split(names[-1], 'dr')[1],
                           '{_WS}+', ' ', 'g')), ' '),
                       w -> upper(substr(w, 1, 1)) || substr(w, 2)
                   ), ' ')
           END AS author
    FROM m
    """,
)
def cdw_author_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: last `dr <name>` match, truncation at embedded 'dr',
    title-case (exo_2.py:191-199)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", extract_author(_AUG_SPARK()).alias("author"))


@register(
    "cdw_filename_parsing",
    oracle="""
    SELECT doc_id, filename,
           regexp_extract(filename, '^([^_]+)_', 1) AS ipp,
           regexp_extract(filename, '^[^_]+_([^_.]+)', 1) AS id_doc_source,
           lower(regexp_extract(filename, '\\.([A-Za-z0-9]+)$', 1)) AS ext,
           CASE lower(regexp_extract(filename, '\\.([A-Za-z0-9]+)$', 1))
               WHEN 'pdf' THEN 'DOSSIER_PATIENT'
               WHEN 'docx' THEN 'RADIOLOGIE_SOFTWARE'
           END AS document_origin_code
    FROM (
        SELECT doc_id,
               source || '_' || CAST(doc_id AS VARCHAR)
                      || CASE WHEN doc_id % 2 = 0 THEN '.pdf' ELSE '.docx' END
                   AS filename
        FROM documents
    )
    """,
)
def cdw_filename_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/P13/F5: `<IPP>_<ID>.<ext>` filename convention → keys +
    source-system code (exo_2.py:238-247)."""
    docs = load_table(spark, sf_dir, "documents")
    filename = F.concat(
        F.col("source"),
        F.lit("_"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, ".pdf").otherwise(".docx"),
    )
    base = docs.select("doc_id", filename.alias("filename"))
    return base.select(
        "doc_id",
        "filename",
        filename_ipp("filename").alias("ipp"),
        filename_doc_id("filename").alias("id_doc_source"),
        filename_extension("filename").alias("ext"),
        document_origin_code(filename_extension("filename")).alias(
            "document_origin_code"
        ),
    )


@register(
    "cdw_fr_date_roundtrip",
    # r12: rotated OFF the driver surface (VERDICT r11 #1) — the
    # dd/MM/yyyy edge is subsumed by the four surviving cdw_* driver
    # rows plus the 400-case fuzz suite (tests/test_fuzz_extraction);
    # its slot went to the r11 retrieval/mining tier. The local oracle
    # replica still hash-checks it every run.
    driver=False,
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d/%m/%Y') AS fr_date,
           try_strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS reparsed
    FROM orders
    """,
)
def cdw_fr_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: dd/MM/yyyy render + parse round-trip (exo_1.py:75,
    exo_2.py:186-188) — DateType internally, French format only at the
    presentation edge."""
    orders = load_table(spark, sf_dir, "orders")
    fr = format_fr_date(F.col("o_orderdate").cast("date"))
    return orders.select(
        "o_orderkey",
        fr.alias("fr_date"),
        F.try_to_date(fr, "dd/MM/yyyy").cast("timestamp").alias("reparsed"),
    )


@register(
    "cdw_pseudonymization",
    # r6: pytest-oracled (surface at its 50 cap) — the privacy tier
    # the reference's patient loader never had (exo_1.py:57-82 writes
    # names/addresses/phones verbatim)
    driver=False,
    oracle="""
    SELECT c_custkey,
           sha256('cdw-salt-1' || c_name) AS pseudonym,
           CASE
               WHEN length(c_name) <= 4 THEN c_name
               ELSE regexp_replace(
                        substr(c_name, 1, length(c_name) - 4),
                        '[0-9]', 'X', 'g'
                    ) || substr(c_name, length(c_name) - 3, 4)
           END AS name_masked,
           c_mktsegment
    FROM customer
    """,
)
def cdw_pseudonymization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-identified customer extract: salted-SHA-256 pseudonym for
    the name (stable → joins/dedup still work), a digit-masked render
    keeping the 4-char suffix (the phone/account-number shape — the
    testdata customer table carries its digits in c_name), direct
    identifiers dropped. Pure
    column expressions (functions/redaction.py), map-only; the hash
    and the masking regex replay bit-identically in DuckDB."""
    from ..functions.redaction import mask_digits, pseudonym

    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        pseudonym("c_name", "cdw-salt-1").alias("pseudonym"),
        mask_digits("c_name", keep_last=4).alias("name_masked"),
        "c_mktsegment",
    )


@register(
    "customers_k_anonymity",
    # r6: pytest-oracled — the audit that makes the pseudonymization
    # claim checkable: no quasi-identifier combination may isolate
    # fewer than k individuals
    driver=False,
    oracle="""
    SELECT c_nationkey, c_mktsegment, acctbal_band, n_members
    FROM (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
               COUNT(*) AS n_members
        FROM customer
        GROUP BY 1, 2, 3
    ) WHERE n_members < 5
    """,
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier combination
    (nation, market segment, account-balance band): every emitted row
    is a re-identification risk — a combination shared by fewer than
    five customers. Pseudonymizing direct identifiers
    (cdw_pseudonymization) is not enough on its own; this is the
    check that the INDIRECT identifiers don't single people out, run
    as one exact group-count pass (map-side combined, integer band
    arithmetic so both engines agree exactly)."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0)
            .cast("long")
            .alias("acctbal_band"),
        )
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") < 5)
    )
