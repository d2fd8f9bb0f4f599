"""Binary document source (SURVEY.md §2.1 S2-S4).

``binaryFile`` scan with a glob filter (listing-time, replacing the
reference's listdir + endswith, exo_2.py:18-35) feeding an
Arrow-batched extraction UDF — the one genuine JVM↔Python boundary in
the engine (SURVEY §4.3.3). The extractor is injected as a plain
``(filename, bytes) -> str`` callable so environments with real PDF
libraries can swap one in without touching the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extractors import extract_text

ExtractFn = Callable[[str, bytes], str]


def _case_insensitive_glob(extensions: tuple[str, ...]) -> str:
    """Hadoop glob matching the extensions in ANY letter case via
    per-character ``[xX]`` classes — ``pathGlobFilter`` is
    case-sensitive, while the snapshot-diff trigger matches
    ``name.lower().endswith(...)``; without this a ``SCAN.PDF`` drop
    would fire the daemon's batch but never be ingested."""
    alts = ",".join(
        "".join(f"[{c}{c.upper()}]" if c.isalpha() else c for c in ext)
        for ext in extensions
    )
    return f"*.{{{alts}}}"


def read_binary_documents(
    spark: SparkSession,
    directory: str,
    extensions: tuple[str, ...] = ("pdf", "docx"),
) -> DataFrame:
    """(path, filename, content) for every matching file, matching
    extensions case-insensitively — consistent with the change trigger
    (streaming/snapshot_diff.take_snapshot) and the reference's
    ``.lower().endswith`` check (exo_2.py:18-35)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", _case_insensitive_glob(extensions))
        .load(directory)
    )
    return df.select(
        "path",
        F.element_at(F.split("path", "/"), -1).alias("filename"),
        "content",
    )


def extract_documents(
    binary_df: DataFrame, extractor: ExtractFn = extract_text
) -> DataFrame:
    """(filename, text) via mapInPandas — Arrow batches of binary
    content cross to Python once; the extractor runs per file inside
    the executor. Output keeps only what downstream needs so the huge
    ``content`` column never shuffles."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "filename": pdf["filename"],
                    "text": [
                        extractor(name, data)
                        for name, data in zip(pdf["filename"], pdf["content"])
                    ],
                }
            )

    return binary_df.select("filename", "content").mapInPandas(
        extract_batches, schema="filename string, text string"
    )
