"""Crawl-tier driver row: the WARC → extract → dedup-probe → MERGE
ingest chain under the driver's own hash (r13, VERDICT r12 #7 — the
WARC/HTML family was the largest with zero driver-surface presence).

The fixture is DETERMINISTIC and derived from the ``documents`` table
so a DuckDB oracle can replay the landed warehouse exactly: each
selected document's text is SANITIZED to its lowercase ``[a-z0-9]+``
token stream joined by single spaces — a string that survives the
HTML round trip byte-for-byte (``<p>{body}</p>`` extracts back as
``body + "\\n"``; no entities, no collapsible whitespace) — and
wrapped in a minimal WARC/1.0 response record. The
``docs_curation_refresh_delta`` precedent: multiple ticks commit
under ONE hash, every commit derived from a doc_id predicate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import TOKEN_RE, word_tokens
from ..tables import load_table
from . import register
from .helpers import scratch_dir

#: fixture classes (all doc_id < _CAP keeps the driver-side WARC
#: build bounded at any sf): % 10 == 0 → tick-1 segment ("a" ids),
#: % 10 == 5 → tick-2 fresh docs ("f" ids), % 20 == 0 with ≥ 2
#: tokens → tick-2 EXACT re-posts of tick-1 bodies ("b" ids), which
#: the MinHash probe must drop deterministically (identical shingle
#: set → identical signature → every band matches → exact Jaccard
#: 1.0 ≥ threshold).
_CAP = 4000
_MH_THRESHOLD = 0.8  # MinHashIndex default; banding is tuned for it


def _http_payload(body: bytes) -> bytes:
    """Minimal HTTP/1.1 200 envelope (the WARC response payload)."""
    return (
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode() + body


def _warc_record(rid: str, uri: str, html: bytes) -> bytes:
    """One WARC/1.0 response record (public spec framing: header
    block, blank line, Content-Length payload, record separator)."""
    payload = _http_payload(html)
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2026-08-14T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode() + payload + b"\r\n\r\n"


def _segment(rows: list[tuple[str, str, str]]) -> bytes:
    """A segment from (rid, uri, body_text) rows — body wrapped in the
    minimal page whose extraction is exactly ``body + "\\n"``."""
    return b"".join(
        _warc_record(
            rid, uri, f"<html><body><p>{body}</p></body></html>".encode()
        )
        for rid, uri, body in rows
    )


@register(
    "warc_ingest_refresh",
    # r13: ON the driver surface (VERDICT r12 #7) — the crawl tier's
    # first driver-hash row; took events_json_props's slot (narrow
    # get_json_object surface whose machinery rides
    # events_cube_profile's oracle). The oracle replays the chain
    # exhaustively: sanitize → extract (body || chr(10)) → the
    # dedup-probe drop rule as exact bigram-shingle Jaccard ≥ 0.8
    # against the tick-1 class (the dedup_index_probe precedent — a
    # threshold-sized 21×3 banding misses a boundary pair with
    # probability ~3e-7, and probe() verifies exact Jaccard on every
    # candidate) → MERGE-keyed union.
    oracle=f"""
    WITH src AS (
        SELECT doc_id,
               array_to_string(regexp_extract_all(lower(text),
                                                  '{TOKEN_RE}'), ' ')
                   AS body
        FROM documents
        WHERE doc_id % 10 IN (0, 5) AND doc_id < {_CAP}
    ),
    ext AS (
        SELECT doc_id, body FROM src WHERE LENGTH(body) > 0
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t)),
                                            i -> t[i] || ' ' || t[i+1]))
                   AS s
        FROM (SELECT doc_id,
                     regexp_extract_all(body, '{TOKEN_RE}') AS t
              FROM ext)
        WHERE len(t) >= 2
    ),
    dropped AS (
        SELECT DISTINCT f.doc_id
        FROM sh f JOIN sh a
          ON f.doc_id % 10 = 5 AND a.doc_id % 10 = 0
        WHERE CAST(len(list_intersect(f.s, a.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(f.s, a.s)))
                  >= {_MH_THRESHOLD}
    )
    SELECT '<urn:uuid:a' || CAST(doc_id AS VARCHAR) || '>' AS doc_id,
           body || chr(10) AS text,
           'http://corpus.example/' || CAST(doc_id AS VARCHAR)
               AS source,
           CAST(LENGTH(body) + 1 AS INT) AS n_chars
    FROM ext WHERE doc_id % 10 = 0
    UNION ALL
    SELECT '<urn:uuid:f' || CAST(e.doc_id AS VARCHAR) || '>' AS doc_id,
           e.body || chr(10) AS text,
           'http://corpus.example/' || CAST(e.doc_id AS VARCHAR)
               AS source,
           CAST(LENGTH(e.body) + 1 AS INT) AS n_chars
    FROM ext e
    WHERE e.doc_id % 10 = 5
      AND e.doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
)
def warc_ingest_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC crawl-ingest loop under the driver's hard hash signal
    (``streaming/warc_ingest.warc_ingest_tick``): two synthetic
    segments — built deterministically from the ``documents`` table —
    are ingested across two ticks against a persisted MinHashIndex,
    and the FINAL merged warehouse must hash-match the oracle's
    replay.

    What the hash proves end to end: the WARC/1.0 parser (record
    framing, HTTP envelope strip, 2xx + text/html gate), the HTML
    block extractor (the sanitized body round-trips as
    ``body + "\\n"``), the mtime snapshot diff (tick 2 sees only the
    new segment; a third tick must NOT fire), the cross-tick MinHash
    dedup probe (tick 2's exact re-posts of tick-1 bodies are ALL
    dropped — identical shingles band identically and verify at
    Jaccard 1.0 — and any genuine near-dup ≥ 0.8 drops too, e.g. the
    planted sf0.001 pair), and the keyed MERGE.

    Scale shape: segments parse inside one Arrow pass (bytes never
    shuffle — only extracted text), the probe is the banded
    bucket-pruned candidate join, and the MERGE is the warehouse's
    keyed upsert. Fresh throwaway state/warehouse/index per call
    (driver and bench re-invoke builders)."""
    from ..operators.dedup_index import MinHashIndex
    from ..operators.merge import ParquetWarehouse
    from ..streaming.snapshot_diff import SnapshotState
    from ..streaming.warc_ingest import warc_ingest_tick

    docs = (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 10).isin(0, 5) & (F.col("doc_id") < _CAP))
        .select(
            "doc_id",
            F.array_join(word_tokens(F.col("text")), " ").alias("body"),
        )
        .where(F.length("body") > 0)
    )
    # driver-bounded: ≤ 2·(_CAP/10) sanitized bodies (the fixture is
    # the point — the tick itself re-reads them as WARC bytes)
    rows = {int(r["doc_id"]): r["body"] for r in docs.collect()}
    a_rows = [
        (f"a{d}", f"http://corpus.example/{d}", b)
        for d, b in sorted(rows.items())
        if d % 10 == 0
    ]
    f_rows = [
        (f"f{d}", f"http://corpus.example/{d}", b)
        for d, b in sorted(rows.items())
        if d % 10 == 5
    ]
    b_rows = [
        (f"b{d}", f"http://corpus.example/repost/{d}", b)
        for d, b in sorted(rows.items())
        if d % 20 == 0 and len(b.split()) >= 2
    ]

    root = scratch_dir("warc_refresh_")
    seg_dir = os.path.join(root, "segments")
    os.makedirs(seg_dir)
    with open(os.path.join(seg_dir, "seg-a.warc"), "wb") as fh:
        fh.write(_segment(a_rows))

    state = SnapshotState.load(os.path.join(root, "offsets.json"))
    wh = ParquetWarehouse(spark, os.path.join(root, "wh"))
    idx = MinHashIndex(
        spark, os.path.join(root, "mh"), threshold=_MH_THRESHOLD
    )
    table = "crawl_docs"
    r1 = warc_ingest_tick(
        spark, seg_dir, state, wh, table, index=idx, main_content=False
    )
    if not r1.fired or r1.docs_merged != len(a_rows):
        raise RuntimeError(f"tick 1 landed {r1.docs_merged} != {len(a_rows)}")
    with open(os.path.join(seg_dir, "seg-b.warc"), "wb") as fh:
        fh.write(_segment(f_rows + b_rows))
    r2 = warc_ingest_tick(
        spark, seg_dir, state, wh, table, index=idx, main_content=False
    )
    if not r2.fired or r2.segments != ("seg-b.warc",):
        raise RuntimeError(f"tick 2 saw {r2.segments}")
    # every exact re-post must have been probe-dropped
    if r2.docs_merged > len(f_rows):
        raise RuntimeError(
            f"tick 2 merged {r2.docs_merged} > {len(f_rows)} fresh — "
            "an exact re-post slipped past the dedup probe"
        )
    r3 = warc_ingest_tick(
        spark, seg_dir, state, wh, table, index=idx, main_content=False
    )
    if r3.fired:
        raise RuntimeError("caught-up tick fired — snapshot diff broken")
    return wh.read(table)
