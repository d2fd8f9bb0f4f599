"""Arbitrary-alignment exact passage machinery: the shared expression
kernel behind ``plans/dedup.docs_exact_substring_dedup`` (the one-shot
corpus pass) and :class:`WindowHashIndex` (its INCREMENTAL twin — the
"has the corpus already seen this passage?" probe a streaming ingest
needs, mirroring what ``operators/dedup_index.MinHashIndex`` is to the
one-shot MinHash pass).

One definition of each step so the batch query and the index cannot
drift:

- :func:`window_hashes` — stride-1 ``W``-token windows, one md5 per
  token position, computed INSIDE the projection so the token array
  never crosses the shuffle that consumes the hashes.
- :func:`spans_to_islands` — running-max interval union of duplicated
  ``[s, e)`` spans per document (cost ∝ duplication, not corpus).
- :func:`cut_islands` — map-side token filtering against the per-doc
  island array via a nested higher-order ``exists``.

Index layout (the ``MinHashIndex`` discipline): ``windows/h_bucket=
<pmod(hash(h), N)>/`` holds one ``(h)`` membership row per stored
window (plus the first owner's ``(doc_id, pos)`` for audit); probes
collect the ≤ N touched buckets driver-side and read ONLY those
partitions (PartitionFilters, plan-pinned), with the batch side
broadcast — the stored postings never shuffle. ``append`` blindly adds
a batch's distinct windows: membership semantics tolerate duplicate
``h`` rows (a healed/replayed batch re-appends postings — probe
answers are unchanged, only storage grows), the same replay contract
MinHashIndex documents.

Concurrency contract: single writer per index root, enforced — every
mutation (build/append/maybe_compact) holds the advisory
``compaction.writer_lock`` flock for the call, so a second writer
process fails fast instead of racing the parked-previous swap; probe
frames must be created after the last compaction (same-process
sequential use, the ingest loops' topology).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .compaction import locked_writer, probe_local_retry, writer_lock
from ..localrel import local_rows_df

from ..functions.tokenize import word_tokens

#: default stride-1 window length (tokens) — plans/dedup.XS_W mirrors
DEFAULT_WINDOW = 32

#: maybe_rebucket trigger (the text index's posture for the
#: window-hash layout) — production-sized default; tests pass smaller
WINDOW_TARGET_BUCKET_ROWS = 1_000_000
WINDOW_REBUCKET_GROWTH = 2.0


def tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ts, n) for non-empty documents — the shared base frame."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            word_tokens(F.col(text_col)).alias("ts"),
        )
        .where(F.size("ts") > 0)
        .select("doc_id", "ts", F.size("ts").alias("n"))
    )


def window_hashes(base: DataFrame, w: int) -> DataFrame:
    """(doc_id, pos, h): md5 of each stride-1 ``w``-token window. The
    md5 runs inside the explode's transform — tokens stay map-side."""
    starts = F.when(
        F.col("n") >= w, F.sequence(F.lit(0), F.col("n") - w)
    ).otherwise(F.array().cast("array<int>"))
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.array_join(F.slice(F.col("ts"), i + 1, w), " ")
                        .cast("binary")
                    ).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))


def spans_to_islands(dup: DataFrame) -> DataFrame:
    """Duplicated ``(doc_id, s, e)`` spans → one row per doc:
    ``(doc_id, isl array<struct<s,e>>, n_tokens_cut)`` — the classic
    running-max interval union, windowed per document over the
    duplicated spans only."""
    prev_end = F.max("e").over(
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gid = F.sum(
        F.when(F.col("s") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0)
    ).over(
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dup.withColumn("gid", gid)
        .groupBy("doc_id", "gid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("s"), F.col("e")))
            ).alias("isl"),
            F.sum(F.col("e") - F.col("s")).cast("long").alias("n_tokens_cut"),
        )
    )


def cut_islands(base: DataFrame, islands: DataFrame) -> DataFrame:
    """Join island sets back (one row per doc WITH duplication) and cut
    the covered tokens MAP-SIDE: (doc_id, n_tokens, n_tokens_cut,
    dedup_text)."""
    joined = base.join(islands, "doc_id", "left").select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_tokens_cut"), F.lit(0).cast("long")).alias(
            "n_tokens_cut"
        ),
        F.coalesce(
            F.col("isl"), F.array().cast("array<struct<s:int,e:int>>")
        ).alias("isl"),
        "ts",
    )
    kept: Column = F.filter(
        F.col("ts"),
        lambda t, i: ~F.exists(
            F.col("isl"), lambda y: (i >= y["s"]) & (i < y["e"])
        ),
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "n_tokens_cut",
        F.array_join(kept, " ").alias("dedup_text"),
    )


def self_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_WINDOW,
) -> DataFrame:
    """IN-BATCH arbitrary-alignment keep-first passage dedup: a
    window's first occurrence within ``docs`` (smallest
    ``(doc_id, pos)``) survives, every later identical window marks
    its span, spans union into islands, covered tokens cut map-side.
    Returns ``(doc_id, n_tokens, n_tokens_cut, dedup_text)`` for
    every NON-EMPTY input document (the P10 empty-doc contract).

    This is THE batch kernel — ``plans/dedup.docs_exact_substring_
    dedup`` registers it over the documents table, and the WARC
    ingest tick runs it on each batch BEFORE ``WindowHashIndex.
    probe`` (the probe only sees batch-vs-index duplication; without
    this pass, boilerplate repeated WITHIN one tick's segment would
    land uncut). One definition, so the one-shot query and the
    streaming caller cannot drift."""
    base = tokenized(docs, id_col, text_col)
    wins = window_hashes(base, w)
    rn = F.row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")
    )
    dup = (
        wins.withColumn("rn", rn)
        .where(F.col("rn") > 1)
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + w).alias("e"),
        )
    )
    return cut_islands(base, spans_to_islands(dup))


class WindowHashIndex:
    """Persisted window-hash membership index for INCREMENTAL
    arbitrary-alignment passage dedup (module docstring). The ingest
    loop mirrors MinHashIndex's::

        cut = index.probe(batch)        # spans already in the corpus
        index.append(batch_kept)        # then the batch joins it

    ``probe`` reports only batch-vs-INDEX duplication; run the batch
    operator (``docs_exact_substring_dedup``'s keep-first) for
    in-batch repeats first, the same division of labor MinHashIndex
    documents. Probe-before-append ordering matters for the same
    reason: probing a document AFTER appending it matches itself and
    cuts everything."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        window: int = DEFAULT_WINDOW,
        h_buckets: int = 32,
        broadcast_max_windows: int = 4_000_000,
    ) -> None:
        self.spark = spark
        self.path = path
        # runtime join-strategy knob, deliberately NOT part of meta:
        # it changes how a probe executes, never what it answers, so
        # reopening an index with a different value must not fail the
        # layout-parameter check. ~4M windows ≈ tens of MB of
        # (doc_id, pos, md5) rows — comfortably under Spark's
        # broadcast limits; a ~1 GiB WARC segment batch produces far
        # more and falls back to the shuffled join (see probe).
        self.broadcast_max_windows = int(broadcast_max_windows)
        self.meta = {"window": int(window), "h_buckets": int(h_buckets)}
        # repair a crashed rebucket/compaction BEFORE the meta check
        # and before any probe can read a half-swapped bucket
        from .compaction import heal, resolve_relayout

        with writer_lock(self.path, blocking=True):
            # blocking: never unpark another process's in-flight
            # compaction swap (writer_lock docstring)
            resolve_relayout(path, ["windows"])
            heal(self._windows_dir())
            heal(self.path)
            meta_path = os.path.join(path, "meta", "meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    stored = json.load(f)
                if stored != self.meta:
                    raise ValueError(
                        f"WindowHashIndex at {path!r} was built with "
                        f"{stored}; reopening with {self.meta} would "
                        "hash probes with a different window length "
                        "and silently miss every stored passage (a "
                        "rebucketed store reopens via "
                        "WindowHashIndex.open)"
                    )
            else:
                # pin BEFORE data exists (crashed mid-build stays
                # guarded)
                self._write_meta()

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "WindowHashIndex":
        """Reopen an existing index from its PERSISTED meta — the only
        way back into a store ``maybe_rebucket`` has re-bucketed.
        Rolls a crashed rebucket forward/back first."""
        from .compaction import resolve_relayout

        with writer_lock(path, blocking=True):
            resolve_relayout(path, ["windows"])
        meta_path = os.path.join(path, "meta", "meta.json")
        if not os.path.exists(meta_path):
            raise ValueError(f"no WindowHashIndex at {path!r}")
        with open(meta_path) as f:
            meta = json.load(f)
        return cls(
            spark,
            path,
            window=meta["window"],
            h_buckets=meta["h_buckets"],
        )

    @classmethod
    def open_local(cls, path: str) -> "WindowHashIndex":
        """Reopen for DRIVER-SIDE SERVING ONLY — no SparkSession, no
        JVM (r13 — the fourth and last member of the ``probe_local``
        family): the handle supports :meth:`probe_local` and nothing
        that plans a Spark job. ``open()``'s crash-healing and meta
        fingerprint run identically (filesystem + JSON only)."""
        return cls.open(None, path)  # type: ignore[arg-type]

    def _local_store_state(self) -> tuple:
        """Store fingerprint (windows dir) — the resident cache key,
        via the shared ``compaction.dir_fingerprint``."""
        from .compaction import dir_fingerprint

        return dir_fingerprint(self._windows_dir())

    @probe_local_retry("_whl_state")
    def probe_local(
        self, text: str
    ) -> tuple[int, int, str] | None:
        """Single-document passage dedup OUTSIDE Spark (r13): cut the
        spans of ONE document that the INDEX already holds, entirely
        on the driver — the RefinedWeb boilerplate cut, served
        interactively (a submission endpoint trims a document against
        the corpus in milliseconds instead of paying a Spark job).

        Decision-identical to :meth:`probe` on a one-row batch —
        pinned in tests — because every step replays the batch
        kernel's math: the same ``[a-z0-9]+`` tokens, the same
        stride-1 ``W``-token window md5 (``hashlib.md5`` of the
        joined window string IS ``F.md5(array_join(...).cast
        ("binary"))``), bucket pruning replays ``pmod(hash(h), N)``
        via the Murmur3-string replica, hit spans union with the
        same adjacent-merging running-max rule
        (``spans_to_islands``), and covered tokens cut by the same
        half-open ``[s, e)`` test. Returns ``(n_tokens,
        n_tokens_cut, dedup_text)`` — or ``None`` for an empty
        document (the batch probe emits no row; the P10 contract).

        Cost model: first touch of an ``h_bucket=`` partition pays
        its pyarrow read into a resident membership set (dropped on
        any store mutation via the directory fingerprint); a warm
        probe is O(windows of THIS document) set lookups."""
        import re

        import pyarrow.parquet as papq

        from ..functions.tokenize import TOKEN_RE
        from .compaction import _data_files
        from .localhash import spark_murmur3_string

        toks = re.findall(TOKEN_RE, text.lower())
        if not toks:
            return None
        n = len(toks)
        # reload PERSISTED meta before any window/bucket arithmetic
        # (r13 review): a cross-process rebucket changes h_buckets,
        # and a handle that only dropped its cache would read bucket
        # dirs at the old modulus and silently miss indexed spans
        state = self._local_store_state()
        if getattr(self, "_whl_state", None) != state:
            with open(
                os.path.join(self.path, "meta", "meta.json")
            ) as f:
                self.meta = json.load(f)
            self._whl_state = state
            self._whl_buckets: dict[int, set] = {}
        w = self.meta["window"]
        if not os.path.isdir(self._windows_dir()):
            return (n, 0, " ".join(toks))  # fresh index cuts nothing
        import hashlib as _hashlib

        wins = []
        if n >= w:
            for i in range(n - w + 1):
                h = _hashlib.md5(
                    " ".join(toks[i : i + w]).encode()
                ).hexdigest()
                wins.append((i, h))
        nb = self.meta["h_buckets"]
        spans = []
        for i, h in wins:
            bucket = spark_murmur3_string(h) % nb
            members = self._whl_buckets.get(bucket)
            if members is None:
                d = os.path.join(self._windows_dir(), f"h_bucket={bucket}")
                members = set()
                if os.path.isdir(d):
                    for fn in _data_files(d):
                        tab = papq.read_table(
                            os.path.join(d, fn), columns=["h"]
                        )
                        members.update(tab.column("h").to_pylist())
                self._whl_buckets[bucket] = members
            if h in members:
                spans.append((i, i + w))
        if not spans:
            return (n, 0, " ".join(toks))
        # spans_to_islands' adjacent-merging running-max union
        spans.sort()
        islands = [list(spans[0])]
        for s, e in spans[1:]:
            if s > islands[-1][1]:
                islands.append([s, e])
            elif e > islands[-1][1]:
                islands[-1][1] = e
        cut = sum(e - s for s, e in islands)
        kept = []
        it = iter(islands)
        cur = next(it, None)
        for i, t in enumerate(toks):
            while cur is not None and i >= cur[1]:
                cur = next(it, None)
            if cur is not None and cur[0] <= i < cur[1]:
                continue
            kept.append(t)
        return (n, cut, " ".join(kept))

    @locked_writer
    def maybe_rebucket(
        self,
        target_bucket_rows: int | None = None,
        growth_factor: float | None = None,
    ) -> bool:
        """Growth-triggered bucket-count scaling — the fourth member
        of the persisted-store family joins the r9 discipline
        (``h_buckets`` is frozen in the meta fingerprint, so a store
        grown across WARC ticks probes ever-fatter ``h_bucket=``
        partitions). Same trigger/swap as the text index: mean bucket
        past ``growth_factor × target_bucket_rows`` window rows →
        rewrite under ``ceil(N/target)`` buckets through the
        crash-safe :func:`compaction.commit_relayout`; probe answers
        are decision-identical (membership semantics — bucketing
        changes where a window row lives, never its content). The
        docs/ roster is unbucketed and untouched."""
        import math
        import shutil

        from .compaction import _TMP, commit_relayout

        tgt = (
            WINDOW_TARGET_BUCKET_ROWS
            if target_bucket_rows is None
            else target_bucket_rows
        )
        growth = (
            WINDOW_REBUCKET_GROWTH
            if growth_factor is None
            else growth_factor
        )
        wdir = self._windows_dir()
        if not os.path.isdir(wdir):
            return False
        # trigger check from parquet footers — no Spark job (r14)
        from .compaction import dir_row_count

        n = dir_row_count(wdir)
        k = self.meta["h_buckets"]
        if n <= growth * tgt * k:
            return False
        k_new = max(2 * k, math.ceil(n / tgt))
        new_meta = dict(self.meta, h_buckets=int(k_new))
        rows = self.spark.read.parquet(wdir).drop("h_bucket")
        tmp = os.path.join(self.path, _TMP + "windows")
        shutil.rmtree(tmp, ignore_errors=True)
        rows.withColumn(
            "h_bucket", F.pmod(F.hash(F.col("h")), F.lit(int(k_new)))
        ).repartition(F.col("h_bucket")).write.mode("overwrite").partitionBy(
            "h_bucket"
        ).parquet(tmp)
        commit_relayout(self.path, ["windows"], new_meta)
        self.meta = new_meta
        return True

    def _write_meta(self) -> None:
        meta_dir = os.path.join(self.path, "meta")
        os.makedirs(meta_dir, exist_ok=True)
        with open(os.path.join(meta_dir, "meta.json"), "w") as f:
            json.dump(self.meta, f)

    def _windows_dir(self) -> str:
        return os.path.join(self.path, "windows")

    def _bucket_expr(self, col: str = "h"):
        return F.pmod(F.hash(F.col(col)), F.lit(self.meta["h_buckets"]))

    def _docs_dir(self) -> str:
        return os.path.join(self.path, "docs")

    def indexed_ids(self) -> DataFrame:
        """The doc-id roster of every append — what the ingest loop's
        heal step diffs against the warehouse to find documents whose
        windows a crash left unindexed. Stored as STRING (ids are only
        membership/audit here — long ids from the documents table and
        urn-string ids from WARC records share one layout); callers
        compare with an explicit ``cast('string')``, never an implicit
        join coercion (long==string coerces both sides to double and
        corrupts ids past 2^53)."""
        if not os.path.isdir(self._docs_dir()):
            return local_rows_df(self.spark, [], "doc_id string")
        return (
            self.spark.read.schema("doc_id string")
            .parquet(self._docs_dir())
            .distinct()
        )

    @locked_writer
    def append(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Store a batch's distinct windows (first in-batch owner kept
        for audit), hash-partitioned on ``h_bucket`` so later probes
        prune, plus the batch's ids in the ``docs/`` roster. Duplicate
        ``h`` / roster rows across appends are harmless (membership
        semantics) — replays converge. Windows land BEFORE the roster:
        a crash between the two leaves the doc off the roster and the
        heal step re-appends it (more duplicate membership rows), never
        the reverse (a rostered doc with missing windows would be
        unhealable)."""
        base = tokenized(docs, id_col, text_col)
        wins = (
            window_hashes(base, self.meta["window"])
            .groupBy("h")
            .agg(
                F.min(F.struct("doc_id", "pos")).alias("o")
            )
            .select(
                "h",
                # string audit id: long and urn-string corpora share
                # one stored layout (see indexed_ids)
                F.col("o.doc_id").cast("string").alias("doc_id"),
                F.col("o.pos").alias("pos"),
                self._bucket_expr().alias("h_bucket"),
            )
        )
        # rebalance on the partition column before the partitioned
        # write (r14, guide §6): one ~file per touched bucket per
        # append instead of tasks × buckets fragments for compaction
        # to mop up; AQE splits fat buckets at scale.
        wins.hint("rebalance", "h_bucket").write.partitionBy(
            "h_bucket"
        ).mode("append").parquet(self._windows_dir())
        docs.select(
            F.col(id_col).cast("string").alias("doc_id")
        ).distinct().write.mode("append").parquet(self._docs_dir())

    def probe(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """(doc_id, n_tokens, n_tokens_cut, dedup_text) for the batch,
        with every span already present in the INDEX cut out. A fresh
        (empty) index cuts nothing."""
        base = tokenized(docs, id_col, text_col)
        if not os.path.isdir(self._windows_dir()):
            # fresh index: nothing to match — pass the batch through
            # with zero-cut accounting (the ingest loop starts here)
            return base.select(
                "doc_id",
                F.col("n").cast("long").alias("n_tokens"),
                F.lit(0).cast("long").alias("n_tokens_cut"),
                F.array_join("ts", " ").alias("dedup_text"),
            )
        w = self.meta["window"]
        wins = window_hashes(base, w).cache()
        try:
            # ≤ h_buckets ints, driver-bounded by parameter — the same
            # touched-bucket collect every pruned probe in this repo does
            touched = sorted(
                r[0]
                for r in wins.select(self._bucket_expr().alias("b"))
                .distinct()
                .collect()
            )
            stored = (
                self.spark.read.schema(
                    "h string, doc_id string, pos int, h_bucket int"
                )
                .parquet(self._windows_dir())
                .filter(F.col("h_bucket").isin(touched))
                .select("h")
            )
            # small batches: stored side never shuffles — batch
            # windows broadcast onto the pruned scan. Large batches
            # (a ~1 GiB WARC segment yields one window per token —
            # hundreds of MB, at or past the broadcast limit): fall
            # back to a shuffled hash join; the stored side is still
            # pruned to the touched h_bucket= partitions, only those
            # postings pay the exchange.
            batch_wins = wins.select("doc_id", "pos", "h")
            if wins.count() <= self.broadcast_max_windows:
                batch_wins = F.broadcast(batch_wins)
            hits = (
                stored.join(batch_wins, "h")
                .select("doc_id", "pos")
                .dropDuplicates(["doc_id", "pos"])
            )
            dup = hits.select(
                "doc_id",
                F.col("pos").alias("s"),
                (F.col("pos") + w).alias("e"),
            )
            # localCheckpoint: the result must not lazily re-read the
            # windows/ directory after the caller appends to it (the
            # probe-then-append loop would otherwise self-match)
            return cut_islands(base, spans_to_islands(dup)).localCheckpoint()
        finally:
            wins.unpersist()

    @locked_writer
    def maybe_compact(
        self,
        max_files_per_bucket: int = 8,
        budget: int | str | None = None,
    ) -> int:
        """Streaming-loop housekeeping (the SnapshotTable
        ``maybe_compact`` discipline ported to the directory store):
        every ``h_bucket=`` partition that accumulated more than
        ``max_files_per_bucket`` append file-sets is rewritten as ONE
        file sorted by ``h`` — duplicate membership rows from replays
        / heals collapse to the first owner, probe answers are
        unchanged (membership semantics), and probe file-listing cost
        returns to O(buckets) instead of O(ticks). The roster compacts
        to its distinct ids the same way. Crash-safe via the
        parked-previous swap (operators/compaction); a crash mid-pass
        heals on the next open or compaction. Returns the number of
        directories rewritten. ``budget`` bounds window buckets folded
        per call (fattest-first — r13, VERDICT r12 #2; the flat
        roster dir stays unbudgeted)."""
        from .compaction import compact_flat, compact_partitioned

        def fold_windows(df: DataFrame) -> DataFrame:
            # h_bucket joins the keys per the r14 fold contract
            # (bucket = f(h), so grouping is unchanged)
            return (
                df.groupBy("h", "h_bucket")
                .agg(F.min(F.struct("doc_id", "pos")).alias("o"))
                .select(
                    "h",
                    F.col("o.doc_id").alias("doc_id"),
                    F.col("o.pos").alias("pos"),
                    "h_bucket",
                )
            )

        n = compact_partitioned(
            self.spark,
            self._windows_dir(),
            "h_bucket",
            "h string, doc_id string, pos int",
            fold_windows,
            ["h"],
            max_files=max_files_per_bucket,
            budget=budget,
        )
        if compact_flat(
            self.spark,
            self._docs_dir(),
            "doc_id string",
            lambda df: df.distinct(),
            ["doc_id"],
            max_files=max_files_per_bucket,
        ):
            n += 1
        return n
