"""Manifest-committed parquet table: the transactional layer the
plain directory-scan warehouse deliberately lacks.

``ParquetWarehouse`` (operators/merge.py) commits by directory swap —
durable and replay-healing, but a concurrent reader can transiently
miss a mid-swap partition and there is no history. ``SnapshotTable``
adds the two properties a table format (Delta/Iceberg) is actually
for, with nothing but parquet + atomic file creation:

- **Atomic commits with optimistic concurrency.** Every commit writes
  its data into a fresh directory, then publishes manifest
  ``_manifests/v{N}.json`` through an exclusive-create commit
  coordinator (default: POSIX hard-link; HDFS/ABFS expose the same
  create-fails-if-exists contract). Object stores without that
  contract inject their own coordinator via the ``commit_coordinator``
  seam — S3 conditional PUT or a DynamoDB lock table, the same
  abstraction Delta's LogStore provides. Two writers racing to
  version N: exactly one wins, the loser re-resolves and retries on
  N+1 — the Delta commit protocol in miniature.
- **Snapshot-isolated readers + time travel.** A reader resolves ONE
  manifest and reads exactly the directories it lists. Commits never
  mutate or delete published data (until ``vacuum``), so an in-flight
  read keeps seeing its snapshot regardless of concurrent commits,
  and ``read(version=N)`` reproduces any historical state.
- **Crash safety for free.** A writer dying between data write and
  manifest publish leaves an orphan directory no manifest references —
  invisible to every reader; ``vacuum()`` sweeps it.

Scale notes: a manifest lists commit DIRECTORIES (one per commit),
not individual files, so manifest size grows with commit count, not
data size; ``compact()`` folds the history into one directory +
fresh commit. Reads hand Spark the directory list — partition
pruning / predicate pushdown inside each directory is unchanged.

Data skipping (the Delta/Iceberg stats tier): every commit records
per-directory column min/max/null-count stats in the manifest,
harvested from the parquet FOOTERS the write already produced (a
metadata-only pass — no data is re-read, the same way Iceberg
collects its manifest stats). ``read(where=...)`` resolves the
manifest, drops every directory whose stats PROVE the predicate
cannot match, and applies the exact predicate to the survivors — so
semantics never depend on the stats, only IO does. ``delete_where``
uses the same proof to leave untouched directories in place
(copy-on-write rewrites only the overlapping ones), and
``read_changes`` turns an append-only version range into a change
feed for incremental downstream pipelines.

Schema evolution: every manifest records the committed table schema;
appends may add nullable columns (old directories read the new column
as null) but never silently change a type. Readers pin the manifest
schema instead of running Spark's ``mergeSchema`` footer sweep — at
100 TB the metadata pass IS the cost, and the manifest already knows
the answer.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: predicate ops understood by the stats pruner; every triple is
#: (column, op, literal) and triples are AND-ed. Kept deliberately
#: small — a triple either PROVES a directory irrelevant or it
#: doesn't, and anything the pruner can't reason about still
#: evaluates exactly on the surviving rows.
_OPS = ("=", "<", "<=", ">", ">=", "in")


def envelope_literal(v):
    """A collected min/max value as a stats-comparable predicate
    literal, or None if the type has no pruning story. Dates and
    timestamps render to the SAME ISO-string form :func:`_stat_value`
    stores (lexicographic == chronological), and Spark coerces the
    string back to the native type for the exact filter — so
    CDC-style time keys get the pruned cost model everywhere an
    envelope is built (merge, IVM), from one definition.

    Timestamps are normalized onto the UTC instant BEFORE rendering:
    PySpark ``collect()`` materializes TimestampType as a NAIVE
    datetime in the driver's OS-local timezone
    (``datetime.fromtimestamp``), while :func:`_stat_value` stores
    naive UTC from the parquet footers. ``astimezone(utc)`` converts
    both aware values and naive OS-local values onto the same instant,
    so an envelope built on a non-UTC driver can never "prove" an
    overlapping directory disjoint (which would silently leave stale
    duplicate-key rows after a merge)."""
    import datetime as _dt
    import math

    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and not math.isfinite(v):
        # NaN/inf poison stats comparisons (every NaN compare is
        # False => wrong pruning proofs) — no envelope for this key
        return None
    return v if isinstance(v, (int, float, str, bool)) else None


def txn_cursor(table, prefix: str) -> int:
    """Recover an integer progress cursor from ``table``'s manifest.

    Primary source: the dedicated ``cursors`` map ({prefix: N}),
    carried forward by every commit and NEVER trimmed — unlike the
    rolling txn window, whose 256-entry bound would otherwise let
    256+ foreign commits between ticks evict every ``{prefix}-N`` id
    and silently reset an IVM consumer to "process everything"
    (double-counting history into the view). Fallback for manifests
    written before the cursors field: the max N over txn ids of
    EXACTLY the form ``{prefix}-{N}``. Strict parse — ids merely
    sharing the prefix (``ivm-bootstrap``, another consumer's
    ``ivm-daily-3``) are ignored rather than crashing the tick or
    cross-contaminating the cursor. Returns -1 when nothing matches
    (process everything)."""
    cur = table.current_version()
    out = -1
    if cur is None:
        return out
    m = table._manifest(cur)
    c = m.get("cursors", {}).get(prefix)
    if c is not None:
        out = int(c)
    for txn in m.get("txns", {}):
        if txn.startswith(prefix + "-"):
            tail = txn[len(prefix) + 1 :]
            if tail.isdigit():
                out = max(out, int(tail))
    return out


class CommitConflict(Exception):
    """Another writer published this version first; caller may retry."""


def _posix_exclusive_link(tmp: str, dst: str) -> bool:
    """Default commit coordinator: POSIX hard-link, which fails with
    EEXIST if another writer already published ``dst`` — the same
    create-fails-if-exists contract HDFS and ABFS expose. Returns
    whether this writer won the version."""
    try:
        os.link(tmp, dst)
    except FileExistsError:
        return False
    return True


def _stat_value(v):
    """Normalize one footer stat into its JSON-safe, totally-ordered
    form, or None if the type can't be used for pruning. Dates and
    timestamps become ISO strings — lexicographic order IS
    chronological order for ISO-8601, so string comparison against an
    ISO-rendered predicate literal prunes correctly (and Spark coerces
    the same literal back to date/timestamp for the exact filter)."""
    import datetime as _dt

    import math

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # normalize to naive UTC: the session runs UTC, envelopes
            # normalize onto the UTC instant too (envelope_literal),
            # and a stray "+00:00" suffix would corrupt lexicographic
            # comparison at boundaries
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and not math.isfinite(v):
        # a NaN min/max makes every comparison False, flipping
        # not(lo < val)-style proofs into WRONG pruning; json.dump
        # would also emit non-standard NaN tokens. Drop the column's
        # stats instead — the directory is kept, never mis-pruned.
        return None
    return v if isinstance(v, (int, float, str, bool)) else None


def _one_file_stats(path: str) -> dict:
    """Min/max/null-count per column for ONE parquet file, from its
    footer (row-group headers only — no data pages). Stats normalize
    through :func:`_stat_value` (ints/floats/strings/bools as-is,
    dates/timestamps as ISO strings); a column with missing or
    unusable stats in ANY row group is dropped (an incomplete min/max
    could wrongly prune)."""
    import pyarrow.parquet as pq

    cols: dict[str, dict] = {}
    dead: set[str] = set()
    meta = pq.ParquetFile(path).metadata
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            col = c.path_in_schema
            if "." in col or col in dead:
                continue  # nested leaves: skip (names ambiguous)
            st = c.statistics
            lo = _stat_value(st.min) if st is not None and st.has_min_max else None
            hi = _stat_value(st.max) if st is not None and st.has_min_max else None
            if lo is None or hi is None:
                dead.add(col)
                cols.pop(col, None)
                continue
            cur = cols.get(col)
            nulls = st.null_count if st.has_null_count else 0
            if cur is None:
                cols[col] = {"min": lo, "max": hi, "nulls": nulls}
            else:
                cur["min"] = min(cur["min"], lo)
                cur["max"] = max(cur["max"], hi)
                cur["nulls"] += nulls
    return {"rows": meta.num_rows, "cols": cols}


def _merge_stats(parts: list[dict]) -> dict:
    """Directory-level aggregate of per-file stats: min of mins, max of
    maxes, summed nulls; a column absent from any NON-EMPTY file is
    dropped at the directory level (its aggregate would be incomplete).
    Zero-row files constrain nothing — Spark sometimes emits empty
    part files for near-empty dataframes, and intersecting their empty
    column sets would silently erase the whole directory's stats."""
    rows = sum(p["rows"] for p in parts)
    parts = [p for p in parts if p["rows"] > 0]
    if not parts:
        return {"rows": rows, "cols": {}}
    shared = set(parts[0]["cols"])
    for p in parts[1:]:
        shared &= set(p["cols"])
    cols = {}
    for col in shared:
        ss = [p["cols"][col] for p in parts]
        cols[col] = {
            "min": min(s["min"] for s in ss),
            "max": max(s["max"] for s in ss),
            "nulls": sum(s["nulls"] for s in ss),
        }
    return {"rows": rows, "cols": cols}


def _footer_stats(path: str) -> dict:
    """Harvest stats for one commit directory: per-FILE min/max/nulls
    (the Delta-log granularity — what makes skipping work INSIDE a
    directory after ``optimize`` clusters it) plus the directory-level
    aggregate the coarse pruning pass reads first. Metadata-only:
    O(files) footer reads, the cost Iceberg pays to build manifests.
    Returns {"rows", "cols", "files": {name: {"rows", "cols"}}}."""
    per_file = {
        name: _one_file_stats(os.path.join(path, name))
        for name in sorted(os.listdir(path))
        if name.endswith(".parquet")
    }
    out = _merge_stats(list(per_file.values()))
    out["files"] = per_file
    return out


def _check_where(where) -> list:
    where = [tuple(t) for t in (where or [])]
    for t in where:
        if len(t) != 3 or t[1] not in _OPS:
            raise ValueError(
                f"predicate triple {t!r}: want (column, op, literal) "
                f"with op in {_OPS}"
            )
        if t[1] == "in" and not (
            isinstance(t[2], (list, tuple)) and len(t[2]) > 0
        ):
            raise ValueError(
                f"predicate triple {t!r}: op 'in' wants a non-empty "
                "list/tuple of literals"
            )
    return where


def _dir_may_match(stats: dict | None, where: list) -> bool:
    """False only when the stats PROVE no row in the directory can
    satisfy the AND of the triples. Missing stats (old manifest, type
    the harvester skipped, incomparable literal) always keep the
    directory — skipping is an optimization, never a semantics bet."""
    if not where:
        return True
    if not stats:
        return True
    if stats.get("rows") == 0:
        return False
    for col, op, val in where:
        st = stats.get("cols", {}).get(col)
        if st is None:
            continue
        lo, hi = st["min"], st["max"]
        try:
            if op == "in" and all(v < lo or v > hi for v in val):
                # no member of the set can live in [min, max] — proof
                return False
            if op == "=" and (val < lo or val > hi):
                return False
            if op == "<" and not (lo < val):
                return False
            if op == "<=" and not (lo <= val):
                return False
            if op == ">" and not (hi > val):
                return False
            if op == ">=" and not (hi >= val):
                return False
        except TypeError:
            continue  # incomparable literal type: no proof, keep
    return True


#: Z-order grid resolution per key: 16 bits — 65k cells per dimension,
#: plenty to separate n_files ≤ a few thousand file ranges, while the
#: interleaved value stays well inside a long for up to 4 keys.
_Z_BITS = 16


def _zvalue(cols: list[str], ranges: dict) -> Column:
    """Bit-interleaved Z-value of ``cols`` scaled into the 2^_Z_BITS
    grid by each column's [min, max] (from manifest stats). Pure
    column expressions — JVM-side, codegen-friendly; NULL scales to
    cell 0 (sorts first, same as a NULLS FIRST cluster)."""
    k = len(cols)
    cells = []
    top = (1 << _Z_BITS) - 1
    for c in cols:
        lo, hi = ranges[c]
        span = float(hi - lo) if hi > lo else 1.0
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
            * F.lit(float(top))
        ).cast("long")
        cells.append(
            F.coalesce(
                F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), scaled)),
                F.lit(0).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(_Z_BITS):
        for i, n in enumerate(cells):
            bit = F.shiftright(n, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def _where_column(where: list) -> Column:
    """The EXACT predicate the pruner approximates, as a Spark filter
    applied to every surviving row."""
    out = F.lit(True)
    for col, op, val in where:
        c = F.col(col)
        if op == "in":
            out = out & c.isin(list(val))
            continue
        out = out & {
            "=": c == val,
            "<": c < val,
            "<=": c <= val,
            ">": c > val,
            ">=": c >= val,
        }[op]
    return out


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        commit_coordinator=None,
    ) -> None:
        """``commit_coordinator`` is the mutual-exclusion seam:
        ``(tmp_manifest_path, final_manifest_path) -> bool`` must
        atomically publish the fully-written tmp manifest at the final
        path iff no other writer has, returning whether it won. The
        default is POSIX/HDFS-style exclusive link; on object stores
        without that contract inject one backed by, e.g., S3
        conditional PUT (If-None-Match) or a DynamoDB lock table —
        exactly the seam Delta's LogStore abstracts."""
        self.spark = spark
        self.path = path
        self._commit = commit_coordinator or _posix_exclusive_link
        self._manifest_memo: dict = {}
        os.makedirs(self._manifest_dir(), exist_ok=True)
        os.makedirs(self._data_dir(), exist_ok=True)

    # -- layout ------------------------------------------------------

    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifests")

    def _data_dir(self) -> str:
        return os.path.join(self.path, "_data")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir(), f"v{version:012d}.json")

    # -- version resolution ------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._manifest_dir()):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        # memoized on (path, mtime_ns, size): manifests embed per-file
        # stats and grow with file count, and one append/merge attempt
        # consults the current manifest several times (txns, dirs,
        # carried stats, schema) — re-parsing the full JSON each time
        # is redundant I/O on the commit hot path. Published manifests
        # are immutable, but keying on stat() keeps even hand-edited
        # test manifests honest.
        path = self._manifest_path(version)
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
        hit = self._manifest_memo.get(version)
        if hit is not None and hit[0] == key:
            self._manifest_memo.pop(version)
            self._manifest_memo[version] = hit  # refresh LRU position
            return hit[1]
        with open(path) as f:
            m = json.load(f)
        # true LRU: evict the least-recently-USED entry, not the
        # lowest version — time-travel workloads re-read OLD manifests
        # repeatedly, and min-version eviction would throw out exactly
        # the entry just inserted
        self._manifest_memo.pop(version, None)
        self._manifest_memo[version] = (key, m)
        if len(self._manifest_memo) > 8:
            self._manifest_memo.pop(next(iter(self._manifest_memo)))
        return m

    # -- commit protocol ---------------------------------------------

    #: bound on the txn-id map carried in each manifest — the replay
    #: window. Streaming replays concern recent batches; ids older
    #: than the newest _TXN_WINDOW are forgotten.
    _TXN_WINDOW = 256

    def _txn_seen(self, txn: str) -> bool:
        # O(1): every manifest carries the rolling txn->version map
        # (the Delta txnAppId table in miniature), so a replay check
        # reads ONE manifest no matter how long the history is — and
        # because the map is carried forward by every commit, it
        # survives replace()/compact()/vacuum() unlike a scan of
        # retained per-version txn fields would.
        cur = self.current_version()
        if cur is None:
            return False
        return txn in self._manifest(cur).get("txns", {})

    def _publish(
        self,
        build_manifest,
        retries: int = 20,
        txn: str | None = None,
        cursor: tuple[str, int] | None = None,
    ) -> int | None:
        """Exclusive-create the next version file; on a race, re-resolve
        and retry (optimistic concurrency). ``build_manifest(current)``
        is re-invoked per attempt AGAINST THE FRESH current version —
        an append retrying with a dirs list computed before a racing
        append landed would silently drop the racer's directory (lost
        update); rebuilding per attempt folds every committed
        predecessor in. ``base_version`` records the snapshot the
        commit was derived from. Replace-style commits ignore
        ``current`` (last writer wins, as in Delta's default
        WriteSerializable for blind overwrites)."""
        for _ in range(retries):
            current = self.current_version()
            if txn is not None and self._txn_seen(txn):
                return None  # a racing replay committed our txn first
            version = 0 if current is None else current + 1
            payload = dict(
                build_manifest(current), version=version, base_version=current
            )
            # carry the rolling txn map forward (trimmed to the newest
            # _TXN_WINDOW entries by version) so _txn_seen stays O(1)
            txns = dict(
                {} if current is None
                else self._manifest(current).get("txns", {})
            )
            if txn is not None:
                txns[txn] = version
            if len(txns) > self._TXN_WINDOW:
                txns = dict(
                    sorted(txns.items(), key=lambda kv: kv[1])[-self._TXN_WINDOW:]
                )
            payload["txns"] = txns
            # the cursors map ({consumer_prefix: source_version}) is
            # carried forward UNTRIMMED — one entry per consumer, so it
            # cannot grow with history, and unlike the txn window it
            # can never evict a slow consumer's progress (txn_cursor)
            cursors = dict(
                {} if current is None
                else self._manifest(current).get("cursors", {})
            )
            if cursor is not None:
                cursors[cursor[0]] = max(
                    int(cursors.get(cursor[0], -1)), int(cursor[1])
                )
            if cursors:
                payload["cursors"] = cursors
            # write + fsync the FULL payload to a tmp file, then
            # os.link it into place: link fails with EEXIST on a race
            # (same mutex as O_EXCL) but, unlike create-then-write, a
            # reader can never observe an empty or partially-written
            # manifest, and a crash can never leave one behind
            tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(payload, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                won = self._commit(tmp, self._manifest_path(version))
            finally:
                os.unlink(tmp)
            if not won:
                continue  # lost the race for this version — retry
            # fsync the manifest DIRECTORY too: the file's bytes are
            # durable (fsync'd above) but the directory entry created
            # by link() is not until the directory inode is flushed —
            # without this a power-loss crash could forget an already
            # acknowledged commit
            dfd = os.open(self._manifest_dir(), os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            return version
        raise CommitConflict(
            f"lost {retries} consecutive version races on {self.path!r}"
        )

    def _write_commit_dir(self, df: DataFrame) -> tuple[str, dict]:
        # NOT rebalanced before the write (r14, measured): most commit
        # frames end in a shuffle that AQE already coalesces to
        # advisory-sized partitions, so a blanket rebalance here only
        # added a shuffle round-trip per commit (docs_curation_refresh_
        # delta regressed 11.4 → 15.1 s when it was tried); no-shuffle
        # appends land one file per input split, which maybe_compact's
        # amortized fold already bounds. The partitioned index/warehouse
        # writes are different — there the fan-out is tasks × buckets
        # and a rebalance on the partition column is a measured win
        # (operators/merge.py, dedup_index.py, text_index.py).
        cdir = f"c-{uuid.uuid4().hex}"
        full = os.path.join(self._data_dir(), cdir)
        # stats-bearing timestamp encoding, scoped to THIS write: INT96
        # (the session default) carries no footer min/max, silently
        # disabling data skipping and merge-envelope pruning on time
        # columns. The DataFrameWriter per-write option is ignored for
        # this setting, so set/restore the session conf around the
        # write instead of mutating it permanently in the constructor
        # (which would change how every other writer in the session
        # encodes timestamps as a side effect of instantiating a table)
        key = "spark.sql.parquet.outputTimestampType"
        saved = self.spark.conf.get(key)
        self.spark.conf.set(key, "TIMESTAMP_MICROS")
        try:
            df.write.parquet(full)
        finally:
            self.spark.conf.set(key, saved)
        return cdir, _footer_stats(full)

    def _evolved_schema(self, current: int | None, df: DataFrame) -> str:
        """Schema-on-commit, the Delta shape: the manifest carries the
        table schema as JSON, so readers NEVER pay a footer-merging
        scan over every file (Spark's ``mergeSchema`` is O(files) of
        footer reads — metadata at 100 TB is itself big data). An
        append may ADD nullable columns (old rows read back as null);
        it may not change an existing column's type or drop columns —
        widening/renames go through an explicit rewrite, exactly the
        strictness Delta defaults to. Returns the merged schema JSON."""
        from pyspark.sql import types as T

        if current is None:
            return df.schema.json()
        prior_json = self._manifest(current).get("schema")
        if prior_json is None:
            return df.schema.json()  # pre-schema manifests: adopt df's
        prior = T.StructType.fromJson(json.loads(prior_json))
        have = {f.name: f for f in prior.fields}
        merged = list(prior.fields)
        for f in df.schema.fields:
            old = have.get(f.name)
            if old is None:
                merged.append(
                    T.StructField(f.name, f.dataType, nullable=True)
                )
            elif old.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution cannot change column {f.name!r} "
                    f"from {old.dataType.simpleString()} to "
                    f"{f.dataType.simpleString()} — rewrite the table "
                    "explicitly (replace) if a type change is intended"
                )
        return T.StructType(merged).json()

    def _carried_stats(self, current: int | None, dirs: list[str]) -> dict:
        """Predecessor stats restricted to the directories the new
        manifest actually lists (dirs a replace/delete dropped must not
        ride along). Directories committed before the stats tier simply
        have no entry — the pruner keeps them unconditionally."""
        if current is None:
            return {}
        prior = self._manifest(current).get("stats", {})
        return {d: prior[d] for d in dirs if d in prior}

    # -- public API --------------------------------------------------

    def append(
        self,
        df: DataFrame,
        txn: str | None = None,
        cursor: tuple[str, int] | None = None,
    ) -> int | None:
        """Add rows; returns the committed version.

        ``cursor=(prefix, N)`` records consumer progress in the
        manifest's untrimmed ``cursors`` map atomically with the
        commit (see :func:`txn_cursor`).

        ``txn`` makes the append IDEMPOTENT for streaming sinks (the
        Delta ``txnAppId``/``txnVersion`` pattern): pass a stable
        batch identity (e.g. ``f"ingest-{batch_id}"``) and a replayed
        micro-batch whose txn already appears in the retained history
        is a silent no-op (returns None) instead of duplicating rows —
        append alone can never be exactly-once under checkpoint
        replay. The txn check re-runs inside the publish loop, so a
        commit that lands between our check and our publish is still
        honored. The txn map rides every manifest (trimmed to the
        newest _TXN_WINDOW entries), so it survives replace/compact/
        vacuum; only a replay older than the window is forgotten."""
        if txn is not None and self._txn_seen(txn):
            return None
        cdir, cstats = self._write_commit_dir(df)

        def build(current: int | None) -> dict:
            dirs = [] if current is None else self._manifest(current)["dirs"]
            m = {
                "op": "append",
                "dirs": [*dirs, cdir],
                "stats": {**self._carried_stats(current, dirs), cdir: cstats},
                # inside build(): a racing append may itself have
                # evolved the schema, so merge against the FRESH current
                "schema": self._evolved_schema(current, df),
            }
            if txn is not None:
                m["txn"] = txn
            return m

        return self._publish(build, txn=txn, cursor=cursor)

    def replace(self, df: DataFrame, txn: str | None = None) -> int | None:
        """Replace the table contents; returns the committed version.

        ``txn`` makes the replace IDEMPOTENT for refresh loops (the
        ``append`` txn pattern, r9): a derived-view refresh — e.g. the
        curation tick re-selecting the training mix — passes a stable
        refresh identity, and a crashed-and-retried refresh whose txn
        already appears in the retained history is a silent no-op
        (returns None) instead of committing an extra identical
        version. The re-check runs inside the publish loop like
        append's."""
        if txn is not None and self._txn_seen(txn):
            return None
        cdir, cstats = self._write_commit_dir(df)

        def build(current: int | None) -> dict:
            m = {
                "op": "replace", "dirs": [cdir], "stats": {cdir: cstats},
                # replace REDEFINES the table, schema included
                "schema": df.schema.json(),
            }
            if txn is not None:
                m["txn"] = txn
            return m

        return self._publish(build, txn=txn)

    def read(
        self, version: int | None = None, where: list | None = None
    ) -> DataFrame:
        """Snapshot read: resolve ONE manifest, read exactly its
        directories. Stable under concurrent commits; ``version=``
        time-travels.

        ``where`` — an AND-ed list of ``(column, op, literal)`` triples,
        op in ``=, <, <=, >, >=`` — turns on manifest data skipping:
        directories whose recorded min/max PROVE the predicate false
        are never handed to Spark at all (their footers aren't even
        opened), and the exact predicate then filters the survivors,
        so the result is identical to ``read(version).filter(...)``
        with strictly less IO. At 100 TB this is the difference
        between "scan the table" and "scan the commits that can
        contain the key range" — the same stats tier Delta/Iceberg
        reads ship. Verify with ``df.inputFiles()``: only surviving
        directories appear."""
        where = _check_where(where)
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"SnapshotTable at {self.path!r} is empty")
        m = self._manifest(v)
        dirs = m["dirs"]
        if not dirs:
            raise FileNotFoundError(f"version {v} holds no data")
        reader = self._reader(m)
        if not where:
            return reader.parquet(
                *[os.path.join(self._data_dir(), d) for d in dirs]
            )
        stats = m.get("stats", {})
        kept = [d for d in dirs if _dir_may_match(stats.get(d), where)]
        # second granularity: per-FILE stats inside each surviving
        # directory (what optimize() clusters for). A directory whose
        # manifest predates file stats is read whole — pruning only on
        # proof. A dir whose files ALL prune drops out entirely.
        paths: list[str] = []
        for d in kept:
            files = (stats.get(d) or {}).get("files")
            if not files:
                paths.append(os.path.join(self._data_dir(), d))
                continue
            paths.extend(
                os.path.join(self._data_dir(), d, name)
                for name, fst in files.items()
                if _dir_may_match(fst, where)
            )
        if not paths:
            # the stats prove NO file can hold a matching row;
            # preserve the schema from any one directory, return no rows
            return (
                reader.parquet(
                    os.path.join(self._data_dir(), dirs[0])
                ).where(F.lit(False))
            )
        return reader.parquet(*paths).where(_where_column(where))

    def _reader(self, manifest: dict):
        """A parquet reader pinned to the manifest's committed schema
        (schema evolution: directories written before a column existed
        read back with that column null — WITHOUT Spark's mergeSchema
        footer sweep, because the manifest already knows the answer).
        Pre-schema manifests fall back to footer inference."""
        sj = manifest.get("schema")
        if sj is None:
            return self.spark.read
        from pyspark.sql import types as T

        return self.spark.read.schema(T.StructType.fromJson(json.loads(sj)))

    def merge(
        self,
        batch: DataFrame,
        keys: list[str],
        txn: str | None = None,
        cursor: tuple[str, int] | None = None,
        deletes: DataFrame | None = None,
        in_cols: list[str] | None = None,
    ) -> int | None:
        """Keyed MERGE (upsert): rows of ``batch`` replace same-key
        rows and insert otherwise — Delta ``MERGE INTO`` in miniature,
        with the stats tier doing the work: a directory whose key
        min/max cannot intersect the batch's key envelope is carried
        AS-IS (zero IO); only overlapping directories rewrite, as
        (existing rows anti-join batch keys) with the batch itself
        landing as its own new directory. Commit cost ∝ data whose key
        range the batch touches, not table size — the same cost model
        as ParquetWarehouse.merge_upsert, but transactional: readers
        see the whole merge or none of it, history keeps the
        pre-merge version, and ``txn`` makes replays no-ops (the
        exactly-once streaming-sink contract for keyed sinks).

        The batch's key envelope is its per-key [min, max] — computed
        with one tiny aggregate on the (cached) batch. Conservative by
        construction: a directory inside the envelope but sharing no
        actual key rewrites to identical rows (correct, just not
        free). Serializable: a racing commit raises CommitConflict.

        ``deletes`` — an optional keys-only frame: existing rows with
        those keys are REMOVED in the same atomic commit (Delta's
        ``WHEN MATCHED THEN DELETE``), sharing the envelope/rewrite
        machinery with the upserts; a key in both ``batch`` and
        ``deletes`` is ambiguous and raises. This is what lets a
        subtractive IVM consumer retire zero-count groups without a
        second commit.

        ``in_cols`` — batch columns (key or layout columns, e.g. a
        persisted hash-bucket) whose envelope should be the exact
        DISTINCT-value set (an ``in`` triple) instead of [min, max].
        For a low-cardinality clustering column a range envelope is
        useless (touched buckets {3, 97} span nearly everything),
        while the IN set prunes every directory holding none of the
        touched buckets. Caller contracts: (a) only pass columns with
        a bounded value domain (the distinct set is a driver collect,
        ≤ the domain size by construction); (b) a non-key in_col must
        be FUNCTIONALLY DEPENDENT on the keys and stamped identically
        on every row ever written for a key — otherwise the proof
        could prune a directory still holding that key's old rows.
        Directories without stats for the column are always kept
        (conservative), so pre-layout history stays correct."""
        if not keys:
            raise ValueError("merge requires at least one key column")
        if txn is not None and self._txn_seen(txn):
            return None
        import functools

        batch = batch.localCheckpoint()  # read 3x: validate+envelope+write
        in_extra = [c for c in (in_cols or []) if c not in keys]
        if deletes is not None:
            deletes = (
                deletes.select(*keys, *in_extra).distinct().localCheckpoint()
            )
        # ONE driver action over the two checkpointed inputs carries
        # every pre-write decision (r15, guide §2.6 — these were FIVE
        # separate jobs per merge, each a scheduler round-trip: the
        # duplicate-key guard, the deletes-emptiness probe, the
        # batch∩deletes overlap guard, the key-range envelope and the
        # per-in-col distinct sets). Semantics are unchanged item by
        # item:
        # - dup guard: rows with ANY null key are excluded (under the
        #   merge's null-unsafe equality they match nothing and are
        #   plain inserts), exactly the old where(nonnull) pre-filter —
        #   here the per-group batch count is max'd over non-null-key
        #   groups only;
        # - overlap: null keys never matched the old left_semi either;
        # - envelope: min/max over group keys equals min/max over rows
        #   (both skip nulls);
        # - in-sets: collect_set skips nulls exactly as the old
        #   distinct + envelope_literal(None) filter did.
        nonnull = functools.reduce(
            lambda a, k: a & F.col(k).isNotNull(), keys, F.lit(True)
        )
        src = batch.select(
            *keys, *in_extra, F.lit(1).alias("__b"), F.lit(0).alias("__d")
        )
        if deletes is not None:
            src = src.unionByName(
                deletes.select(
                    *keys,
                    *in_extra,
                    F.lit(0).alias("__b"),
                    F.lit(1).alias("__d"),
                )
            )
        range_keys = [k for k in keys if k not in set(in_cols or [])]
        in_key_cols = [k for k in (in_cols or []) if k in keys]
        grouped = src.groupBy(*keys).agg(
            F.sum("__b").alias("__nb"),
            F.sum("__d").alias("__nd"),
            *[F.collect_set(c).alias(f"__s_{c}") for c in in_extra],
        )
        env = grouped.agg(
            F.max(F.when(nonnull, F.col("__nb"))).alias("__maxdup"),
            F.sum("__nd").alias("__ndel"),
            F.max(
                F.when(
                    nonnull & (F.col("__nb") > 0) & (F.col("__nd") > 0), 1
                )
            ).alias("__overlap"),
            *[
                f
                for k in range_keys
                for f in (
                    F.min(k).alias(f"__lo_{k}"),
                    F.max(k).alias(f"__hi_{k}"),
                )
            ],
            *[F.collect_set(k).alias(f"__in_{k}") for k in in_key_cols],
            *[
                F.array_distinct(F.flatten(F.collect_set(f"__s_{c}")))
                .alias(f"__in_{c}")
                for c in in_extra
            ],
        ).collect()[0]
        if (env["__maxdup"] or 0) > 1:
            raise ValueError(
                f"merge batch contains duplicate keys on {keys}; "
                "deduplicate deterministically first (e.g. "
                "operators.dedup.keep_first_dedup)"
            )
        if not env["__ndel"]:
            deletes = None
        if deletes is not None and env["__overlap"]:
            raise ValueError(
                f"merge: key(s) present in both batch and deletes "
                f"on {keys} — upsert-or-delete per key is ambiguous"
            )
        v = self.current_version()
        if v is None:
            return self.append(batch, txn=txn, cursor=cursor)
        m = self._manifest(v)
        stats = m.get("stats", {})
        where = []
        for k in range_keys:
            lo = envelope_literal(env[f"__lo_{k}"])
            hi = envelope_literal(env[f"__hi_{k}"])
            if lo is not None and hi is not None:
                where.extend([(k, ">=", lo), (k, "<=", hi)])
        for k in in_cols or []:
            # bounded-domain contract (docstring): the distinct set is
            # ≤ the column's value domain, a driver-safe collect
            vals = sorted(
                v
                for v in (
                    envelope_literal(x) for x in (env[f"__in_{k}"] or [])
                )
                if v is not None
            )
            if vals:
                where.append((k, "in", vals))
        keep_dirs = [
            d for d in m["dirs"] if not _dir_may_match(stats.get(d), where)
        ]
        touch_dirs = [d for d in m["dirs"] if d not in set(keep_dirs)]
        new: list[tuple[str, dict]] = []
        if touch_dirs:
            existing = self._reader(m).parquet(
                *[os.path.join(self._data_dir(), d) for d in touch_dirs]
            )
            drop_keys = batch.select(*keys).distinct()
            if deletes is not None:
                drop_keys = drop_keys.unionByName(
                    deletes.select(*keys)
                ).distinct()
            survivors = existing.join(
                F.broadcast(drop_keys), keys, "left_anti"
            )
            new.append(self._write_commit_dir(survivors))
        new.append(self._write_commit_dir(batch))
        dirs = [*keep_dirs, *[d for d, _ in new]]

        def build(current: int | None) -> dict:
            if current != v:
                raise CommitConflict(
                    f"merge derived from version {v} but current is now "
                    f"{current}; re-run against the fresh snapshot"
                )
            out = {
                "op": "merge",
                "dirs": dirs,
                "keys": keys,
                "rewrote": len(touch_dirs),
                "stats": {
                    **self._carried_stats(v, keep_dirs),
                    **dict(new),
                },
                "schema": self._evolved_schema(v, batch),
            }
            if txn is not None:
                out["txn"] = txn
            return out

        return self._publish(build, txn=txn, cursor=cursor)

    def delete_where(self, where: list) -> int:
        """Copy-on-write DELETE: directories whose stats prove they
        hold no matching row are carried into the new version AS-IS
        (no read, no write — at scale, almost all of them); only the
        overlapping directories are rewritten without the matching
        rows. Commit cost is ∝ data that might contain deletes, not
        table size — the shape a GDPR erasure or retention sweep needs.
        Returns the committed version."""
        where = _check_where(where)
        if not where:
            raise ValueError("delete_where requires at least one triple")
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"SnapshotTable at {self.path!r} is empty")
        m = self._manifest(v)
        stats = m.get("stats", {})
        keep_dirs = [
            d for d in m["dirs"] if not _dir_may_match(stats.get(d), where)
        ]
        touch_dirs = [d for d in m["dirs"] if d not in set(keep_dirs)]
        new: list[tuple[str, dict]] = []
        if touch_dirs:
            # pinned to the manifest schema: touched directories may
            # straddle a schema evolution, and an unpinned read would
            # adopt ONE file's footer and silently drop the columns
            # the others carry
            survivors = self._reader(m).parquet(
                *[os.path.join(self._data_dir(), d) for d in touch_dirs]
            )
            # three-valued logic: for a NULL predicate column the
            # condition is NULL and a bare ~cond would DROP the row —
            # but DELETE must remove only rows the predicate PROVES
            # match, so NULL-condition rows survive (SQL DELETE
            # semantics; also what the stats-pruned directories do,
            # keeping the two paths consistent)
            cond = _where_column(where)
            survivors = survivors.where(~cond | cond.isNull())
            new.append(self._write_commit_dir(survivors))
        dirs = [*keep_dirs, *[d for d, _ in new]]

        def build(current: int | None) -> dict:
            if current != v:
                # a commit landed after the snapshot this delete was
                # computed from — blindly publishing would drop its
                # rows (lost update). Serializable conflict: caller
                # re-runs delete_where against the fresh state.
                raise CommitConflict(
                    f"delete_where derived from version {v} but current "
                    f"is now {current}; re-run against the fresh snapshot"
                )
            return {
                "op": "delete",
                "dirs": dirs,
                "rewrote": len(touch_dirs),
                "stats": {
                    **self._carried_stats(v, keep_dirs),
                    **dict(new),
                },
                "schema": m.get("schema"),
            }

        return self._publish(build)

    def optimize(
        self,
        by: list[str] | str,
        n_files: int = 16,
        zorder: bool = False,
    ) -> int:
        """Rewrite the table CLUSTERED on ``by`` so the per-file stats
        actually prune (Delta ``OPTIMIZE ... ZORDER BY`` in miniature).
        Appends arrive in insertion order, so every file's [min,max]
        on a query key tends to span the whole domain and file skipping
        proves nothing; after clustering, each of the ``n_files`` files
        covers a narrow key range and a point/range ``read(where=...)``
        touches the few files whose range overlaps.

        - Single key or lexicographic multi-key: ``repartitionByRange``
          on the key(s) + ``sortWithinPartitions`` (tight row-group
          stats inside each file).
        - ``zorder=True`` (two or more NUMERIC keys): cluster on the
          bit-interleaved Z-value of the keys scaled into 16-bit grid
          cells — a range predicate on ANY single key then maps to a
          bounded set of Z-runs, so skipping works per-key without one
          key dominating the sort (the reason Delta Z-orders instead
          of sorting). The grid is scaled by each key's [min,max] READ
          FROM THE MANIFEST STATS — metadata the table already has; no
          extra data pass.

        Serializable like ``delete_where``: a commit racing past the
        snapshot this rewrite was derived from raises CommitConflict
        rather than being silently dropped. Returns the new version."""
        cols = [by] if isinstance(by, str) else list(by)
        if not cols:
            raise ValueError("optimize requires at least one column")
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"SnapshotTable at {self.path!r} is empty")
        df = self.read(version=v)
        if zorder:
            if len(cols) < 2:
                raise ValueError("zorder needs two or more columns")
            if len(cols) > 3:
                # 16 bits x 4 cols puts the top interleaved bit in the
                # long's SIGN bit (b*k+i = 63): upper-range rows would
                # z-sort negative and the clustering silently degrades
                raise ValueError(
                    "zorder supports at most 3 columns at 16-bit grid "
                    "resolution (bit 15*k+k-1 must stay below the sign "
                    "bit); cluster on the 3 most-queried keys"
                )
            ranges = self._stat_ranges(v, cols)
            zcol = _zvalue(cols, ranges)
            clustered = (
                df.withColumn("__z", zcol)
                .repartitionByRange(n_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            clustered = df.repartitionByRange(
                n_files, *cols
            ).sortWithinPartitions(*cols)
        cdir, cstats = self._write_commit_dir(clustered)

        def build(current: int | None) -> dict:
            if current != v:
                raise CommitConflict(
                    f"optimize derived from version {v} but current is "
                    f"now {current}; re-run against the fresh snapshot"
                )
            return {
                "op": "optimize",
                "dirs": [cdir],
                "by": cols,
                "zorder": zorder,
                "stats": {cdir: cstats},
                "schema": self._manifest(v).get("schema"),
            }

        return self._publish(build)

    def _stat_ranges(self, version: int, cols: list[str]) -> dict:
        """[min, max] per column aggregated across every directory of
        ``version``, from manifest stats alone. Raises if any NON-EMPTY
        directory lacks stats for a requested column — scaling a Z-grid
        from a partial range would silently mis-cluster. Zero-row
        directories (an empty streaming micro-batch, IVM's empty-delta
        cursor-advancing append) constrain nothing and are skipped —
        they must not wedge optimize() forever."""
        m = self._manifest(version)
        stats = m.get("stats", {})
        out: dict[str, tuple] = {}
        for col in cols:
            lo = hi = None
            for d in m["dirs"]:
                dstats = stats.get(d) or {}
                if dstats.get("rows") == 0:
                    continue
                st = dstats.get("cols", {}).get(col)
                if st is None or not isinstance(st["min"], (int, float)):
                    raise ValueError(
                        f"no numeric manifest stats for column {col!r} in "
                        f"directory {d!r} — cannot scale the cluster grid"
                    )
                lo = st["min"] if lo is None else min(lo, st["min"])
                hi = st["max"] if hi is None else max(hi, st["max"])
            if lo is None:
                raise ValueError(
                    f"no non-empty directory carries stats for column "
                    f"{col!r} — cannot scale the cluster grid"
                )
            out[col] = (lo, hi)
        return out

    def read_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change feed over an APPEND-ONLY version range: the rows
        added strictly after ``from_version`` up to ``to_version``
        (default: current) — i.e. read only the commit directories
        those versions introduced. This is what lets a downstream
        incremental pipeline process each batch exactly once instead
        of re-scanning the table per tick. If any commit in the range
        is not an append (replace/delete rewrote history), there IS no
        row-level delta to hand out and this raises — the caller falls
        back to a full re-read, the same contract Delta's change feed
        enforces when CDF data is absent."""
        to_version = (
            self.current_version() if to_version is None else to_version
        )
        if to_version is None or from_version > to_version:
            raise ValueError(
                f"bad change range ({from_version}, {to_version}]"
            )
        new_dirs: list[str] = []
        for v in range(from_version + 1, to_version + 1):
            m = self._manifest(v)
            if m["op"] != "append":
                raise ValueError(
                    f"version {v} is {m['op']!r}, not append: no row-level "
                    "change feed across it — re-read the snapshot"
                )
            base = set(self._manifest(v - 1)["dirs"]) if v > 0 else set()
            new_dirs.extend(d for d in m["dirs"] if d not in base)
        if not new_dirs:
            return self.read(to_version).where(F.lit(False))
        # pinned to to_version's committed schema: a delta spanning a
        # schema-evolving append reads consistently (older directories
        # surface the new column as null)
        return self._reader(self._manifest(to_version)).parquet(
            *[os.path.join(self._data_dir(), d) for d in new_dirs]
        )

    def read_changes_signed(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed with RETRACTIONS over ANY version
        range — the generalization :meth:`read_changes` refuses.

        Every commit here is copy-on-write over whole directories, so
        the exact row multiset delta of a range is::

            + rows of directories the range ADDED
            - rows of directories the range REMOVED

        appended rows appear once with ``__sign = +1``; deleted or
        replaced rows appear with ``__sign = -1``. Rows a merge/delete
        merely REWROTE (carried survivors) appear in both an added and
        a removed directory and cancel under any sign-weighted
        aggregation — which is exactly how a subtractive IVM consumer
        (``operators.ivm``) uses this feed: COUNT folds ``sum(sign)``,
        SUM folds ``sum(sign * v)``. A pure rewrite (compact/optimize/
        restore) nets to zero everywhere. Cost ∝ data the range's
        commits physically added or removed, never table size.

        Raises if a removed directory was already vacuumed (the
        retraction rows are gone — re-read the snapshot), the same
        horizon contract Delta's CDF enforces."""
        to_version = (
            self.current_version() if to_version is None else to_version
        )
        if to_version is None or from_version > to_version:
            raise ValueError(
                f"bad change range ({from_version}, {to_version}]"
            )
        # a directory's net contribution over the range is simply its
        # presence at the endpoints (added-then-removed inside the
        # range cancels; removed-then-restored cancels) — two manifest
        # reads, independent of range length
        start = (
            set()
            if from_version < 0
            else set(self._manifest(from_version)["dirs"])
        )
        end = set(self._manifest(to_version)["dirs"])
        plus = sorted(end - start)
        minus = sorted(start - end)
        reader = self._reader(self._manifest(to_version))

        def load(dirs: list[str], sign: int) -> DataFrame:
            paths = []
            for d in dirs:
                p = os.path.join(self._data_dir(), d)
                if not os.path.isdir(p):
                    raise FileNotFoundError(
                        f"change feed needs directory {d!r}, which was "
                        "vacuumed — re-read the snapshot instead"
                    )
                paths.append(p)
            return reader.parquet(*paths).withColumn(
                "__sign", F.lit(sign).cast("int")
            )

        if not plus and not minus:
            sj = self._manifest(to_version).get("schema")
            if sj is not None:
                from pyspark.sql import types as T

                from ..localrel import local_rows_df

                empty = local_rows_df(
                    self.spark, [], T.StructType.fromJson(json.loads(sj))
                )
            else:
                empty = self.read(to_version).limit(0)
            return empty.withColumn(
                "__sign", F.lit(1).cast("int")
            ).where(F.lit(False))
        parts = []
        if plus:
            parts.append(load(plus, 1))
        if minus:
            parts.append(load(minus, -1))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def compact(self) -> int:
        """Fold the accumulated commit directories into one (the
        manifest grows with commit count, not data size — compaction
        resets that and merges small files)."""
        return self.replace(self.read())

    def restore(self, version: int) -> int:
        """Zero-copy rollback (Delta RESTORE): commit a NEW version
        whose directory list, stats and schema are those of
        ``version`` — no data moves, history is preserved (the bad
        versions stay inspectable until vacuum), and concurrent
        readers are unaffected. The restored-to directories must still
        exist: restoring past a vacuum horizon raises."""
        src = self._manifest(version)
        for d in src["dirs"]:
            if not os.path.isdir(os.path.join(self._data_dir(), d)):
                raise FileNotFoundError(
                    f"cannot restore to version {version}: directory "
                    f"{d!r} was vacuumed"
                )

        def build(current: int | None) -> dict:
            # re-validate inside the publish loop: a vacuum racing the
            # restore could sweep the old directories between the
            # entry check and the commit — better to fail the restore
            # than publish a current version that cannot be read.
            # (A vacuum running AFTER the commit keeps them: its keep
            # set is computed from the newest manifests, which now
            # include this one.)
            for d in src["dirs"]:
                if not os.path.isdir(os.path.join(self._data_dir(), d)):
                    raise FileNotFoundError(
                        f"cannot restore to version {version}: directory "
                        f"{d!r} was vacuumed mid-restore"
                    )
            return {
                "op": "restore",
                "restored_from": version,
                "dirs": src["dirs"],
                "stats": src.get("stats", {}),
                "schema": src.get("schema"),
            }

        return self._publish(build)

    def maybe_compact(self, max_dirs: int = 64) -> int | None:
        """Streaming-sink housekeeping: compact only once the current
        version lists more than ``max_dirs`` commit directories —
        bounding both manifest size and small-file count at an
        amortized cost of one full rewrite per ``max_dirs`` commits
        (the auto-compaction policy table formats run after
        micro-batch appends). Returns the new version, or None if the
        table is empty or under the threshold."""
        v = self.current_version()
        if v is None or len(self._manifest(v)["dirs"]) <= max_dirs:
            return None
        return self.compact()

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self.versions()]

    def vacuum(
        self, keep_versions: int = 1, min_age_seconds: float = 600.0
    ) -> list[str]:
        """Delete data directories not referenced by the newest
        ``keep_versions`` manifests, plus orphans from crashed commits.
        Time travel beyond the kept window dies here — that is the
        deliberate trade every table format makes; readers of KEPT
        versions are unaffected (their directories stay). Returns the
        removed directory names.

        ``min_age_seconds`` is the in-flight-commit guard (Delta's
        retention-hours in miniature): a writer that has written its
        data directory but not yet published its manifest looks
        exactly like a crash orphan, so only directories older than
        the age threshold are swept. Pass 0 only when no writer can
        possibly be mid-commit."""
        if keep_versions < 1:
            # keep_versions=0 would delete every data directory while
            # leaving manifests that reference them — a corrupt table,
            # not an aggressive vacuum
            raise ValueError("vacuum must keep at least 1 version")
        import time

        now = time.time()
        vs = self.versions()
        keep = set()
        for v in vs[-keep_versions:]:
            keep.update(self._manifest(v)["dirs"])
        removed = []
        for d in os.listdir(self._data_dir()):
            full = os.path.join(self._data_dir(), d)
            if d in keep:
                continue
            if now - os.path.getmtime(full) < min_age_seconds:
                continue  # possibly an in-flight commit, not an orphan
            shutil.rmtree(full)
            removed.append(d)
        for v in vs[:-keep_versions]:
            os.unlink(self._manifest_path(v))
        # sweep tmp manifests from hard-crashed publishes (the finally
        # unlink never ran); same age guard as data dirs
        for name in os.listdir(self._manifest_dir()):
            if ".tmp-" in name:
                full = os.path.join(self._manifest_dir(), name)
                if now - os.path.getmtime(full) >= min_age_seconds:
                    os.unlink(full)
                    removed.append(name)
        return sorted(removed)
