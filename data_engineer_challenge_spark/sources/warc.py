"""Pure-stdlib WARC (Web ARChive, ISO 28500) source.

Common Crawl — the canonical LLM pretraining source — ships as WARC:
a concatenation of records, each ``WARC/1.x`` header block + payload,
usually gzip-compressed *per record* (multi-member gzip) so a file is
seekable at record granularity. The classic corpus pipeline is

    WARC scan -> response records -> HTTP body -> HTML text
    -> documents schema -> dedup/quality (the rest of this engine)

Scale shape: one Common Crawl segment file is ~1 GiB — the natural
unit of parallelism. ``read_warc_records`` scans files via Spark's
``binaryFile`` source (one task per file, listing parallelized) and
parses records inside an Arrow ``mapInPandas`` pass; only the selected
header fields and payload leave the parser, and downstream projections
drop the payload column before anything shuffles. At 100 TB you run
one task per file across the fleet — no driver-side parsing, no
record-level shuffle until after the HTML->text reduction (~10x
smaller than the raw bytes).

Parsing follows the WARC 1.0/1.1 spec (headers are RFC-822-style
``Name: value`` lines, ``Content-Length`` is mandatory, records are
separated by CRLF CRLF). HTTP response payloads are stored as
captured on the wire; chunked transfer-encoding and gzip/deflate
``Content-Encoding`` are both decoded so callers always see the
entity bytes (real crawls store bodies as served, which is routinely
compressed — feeding those raw bytes to the HTML extractor would
yield replacement-char garbage that still passes a non-empty check).
A record whose framing is corrupt is skipped by resyncing to the next
``WARC/`` magic so one bad record never discards the rest of a
segment.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .html import html_bytes_to_text, html_main_content


def _decompress_if_gzip(data: bytes) -> bytes:
    """Whole-file or multi-member (per-record) gzip -> plain bytes.
    ``gzip.GzipFile`` reads concatenated members natively."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gf:
            return gf.read()
    return data


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield records as dicts: ``headers`` (dict, original-case keys
    preserved under lowercase lookup) plus ``payload`` bytes.

    Tolerant of corruption: a record with garbled framing (stray bytes
    between records, bad/missing ``Content-Length``) is skipped by
    resyncing to the next ``\\r\\nWARC/`` magic, so a mid-file glitch
    loses that record — not every record after it. Only a truncated
    final record stops the scan early."""
    data = _decompress_if_gzip(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            pos = _resync(data, pos)
            if pos < 0:
                return
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        header_block = data[pos : hdr_end].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = _resync(data, hdr_end)  # unframeable — skip record
            if pos < 0:
                return
            continue
        body_start = hdr_end + 4
        if body_start + length > n:
            return  # truncated record
        yield {
            "version": lines[0],
            "headers": headers,
            "payload": data[body_start : body_start + length],
        }
        pos = body_start + length


def _resync(data: bytes, pos: int) -> int:
    """Position of the next record magic at/after ``pos`` (the WARC
    version line always follows a blank line), or -1 past the last."""
    nxt = data.find(b"\r\nWARC/", pos)
    return -1 if nxt < 0 else nxt + 2


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer-encoding; on any malformed
    chunk header, return what decoded so far plus nothing else."""
    out = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        chunk_start = eol + 2
        out.append(body[chunk_start : chunk_start + size])
        pos = chunk_start + size + 2  # skip trailing CRLF
    return b"".join(out)


def _decode_content_encoding(body: bytes, encoding: str) -> bytes:
    """Entity bytes for a gzip/deflate ``Content-Encoding`` body; raw
    bytes unchanged for identity/unknown encodings or corrupt streams
    (a wrong-but-present header must not throw away the record)."""
    import zlib

    enc = encoding.split(",")[-1].strip().lower()  # last-applied coding
    try:
        if enc in ("gzip", "x-gzip"):
            return gzip.decompress(body)
        if enc == "deflate":
            try:
                return zlib.decompress(body)  # RFC-correct zlib wrapper
            except zlib.error:
                return zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
    except Exception:
        return body
    return body


def http_response_body(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) from an HTTP response payload. Chunked
    bodies are de-chunked, then gzip/deflate ``Content-Encoding`` is
    decoded (see module docstring — crawl captures store bodies as
    served). Raises ValueError on a non-HTTP payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    head = payload[:sep].decode("latin-1")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(" ")[1])
    except (IndexError, ValueError):
        raise ValueError(f"bad status line: {lines[0]!r}") from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = payload[sep + 4 :]
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = _dechunk(body)
    ce = headers.get("content-encoding", "")
    if ce:
        body = _decode_content_encoding(body, ce)
    return status, headers, body


_RECORD_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, "
    "content_type string, body binary"
)


def read_warc_records(
    spark: SparkSession,
    path: str | list[str],
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """One row per WARC record of the requested types across
    ``*.warc`` / ``*.warc.gz`` files under ``path`` (a directory, or
    an explicit list of segment files — the incremental-ingest shape).

    For ``response`` records the HTTP envelope is parsed off inside
    the same Arrow pass: ``body`` is the entity body, ``http_status``
    and ``content_type`` come from the HTTP headers (falling back to
    the WARC ``Content-Type`` for non-HTTP record types)."""
    reader = spark.read.format("binaryFile")
    if isinstance(path, str):
        # directory scan: filter to WARC extensions. An explicit file
        # list is NOT re-filtered — the caller already chose the files,
        # and a glob would silently drop mixed-case names the
        # incremental-ingest snapshot matched case-insensitively
        reader = reader.option(
            "pathGlobFilter", "*.{warc,warc.gz,WARC,WARC.gz}"
        )
    binary = reader.load(path if isinstance(path, str) else list(path))
    wanted = {t.lower() for t in warc_types}

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(data)):
                    h = rec["headers"]
                    rtype = h.get("warc-type", "")
                    if rtype.lower() not in wanted:
                        continue
                    status, ctype, body = None, h.get("content-type"), rec["payload"]
                    if rtype.lower() == "response" and body.startswith(b"HTTP/"):
                        try:
                            status, hh, body = http_response_body(body)
                            ctype = hh.get("content-type", ctype)
                        except ValueError:
                            body = rec["payload"]
                    rows.append(
                        (
                            fname,
                            h.get("warc-record-id", ""),
                            rtype,
                            h.get("warc-target-uri", ""),
                            h.get("warc-date", ""),
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "http_status", "content_type", "body",
                ],
            )

    return binary.select("path", "content").mapInPandas(
        parse_files, schema=_RECORD_SCHEMA
    )


def _html_responses(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Successful (2xx) HTML response records — the shared entry
    filter for every page-level extraction below (one definition so a
    filter fix can never diverge between the text and link paths)."""
    return read_warc_records(spark, path).where(
        (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
        & F.lower(F.coalesce("content_type", F.lit(""))).contains("text/html")
    )


def warc_html_documents(
    spark: SparkSession,
    path: str | list[str],
    main_content: bool = True,
    with_segment: bool = False,
) -> DataFrame:
    """End-to-end WARC -> documents: successful (2xx) HTML responses,
    text extracted (boilerplate-stripped when ``main_content``), rows
    shaped like the ``documents`` table (doc_id, text, source,
    n_chars) so every downstream dedup/quality operator applies
    unchanged. The binary ``body`` is dropped inside the Arrow pass —
    only extracted text shuffles. ``with_segment`` adds the source
    segment's file path (``segment``) for callers that need
    per-segment attribution (the ingest tick's per-segment txn ids)."""
    records = _html_responses(spark, path)
    extractor = html_main_content if main_content else html_bytes_to_text

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["record_id"],
                "text": [extractor(bytes(b)) for b in pdf["body"]],
                "source": pdf["target_uri"],
            }
            if with_segment:
                out["segment"] = pdf["warc_file"]
            yield pd.DataFrame(out)

    cols = ["record_id", "target_uri", "body"]
    schema = "doc_id string, text string, source string"
    if with_segment:
        cols.append("warc_file")
        schema += ", segment string"
    docs = records.select(*cols).mapInPandas(extract, schema=schema)
    return docs.where(F.length("text") > 0).withColumn(
        "n_chars", F.length("text")
    )


def warc_link_graph(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Crawl link graph from WARC segments: one (src_url, dst_url) row
    per outgoing hyperlink of every successful HTML response, both
    endpoints CANONICALIZED (functions/urls.normalize_url) and exact
    duplicates dropped. This is the input operators/graph.pagerank and
    count_triangles expect — the classic crawl-frontier / page-quality
    pipeline (links extracted inside the same Arrow pass that already
    holds the page bytes; only the edge list shuffles)."""
    from ..functions.urls import normalize_url
    from .html import html_links

    records = _html_responses(spark, path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, dsts = [], []
            for uri, body in zip(pdf["target_uri"], pdf["body"]):
                for link in html_links(bytes(body), base_url=uri):
                    srcs.append(uri)
                    dsts.append(link)
            yield pd.DataFrame({"src_url": srcs, "dst_url": dsts})

    edges = records.select("target_uri", "body").mapInPandas(
        extract, schema="src_url string, dst_url string"
    )
    return (
        edges.select(
            normalize_url("src_url").alias("src_url"),
            normalize_url("dst_url").alias("dst_url"),
        )
        .where(F.col("src_url").isNotNull() & F.col("dst_url").isNotNull())
        .distinct()
    )
