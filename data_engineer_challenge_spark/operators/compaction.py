"""Crash-safe small-file compaction for the persisted index stores.

The incremental indexes (``MinHashIndex``, ``WindowHashIndex``,
``InvertedTextIndex``) append one Spark file-set per tick into their
hash-partitioned directories — correct, but a 30 s-cadence ingest loop
accumulates thousands of small files per bucket, and probe listing
cost then grows with tick count even when partition pruning works.
``SnapshotTable.maybe_compact`` already bounds this for the lakehouse
table; this module ports the same amortized discipline to the
directory-layout stores.

Crash safety is the parked-previous swap from ``operators/merge.py``
(ParquetWarehouse's partition overwrite): the compacted replacement is
written to a dot-prefixed sibling (invisible to Spark readers), the
live directory is parked as ``.old-<name>``, the replacement renamed
in, and the parked copy removed — every intermediate state either
keeps the live directory intact or is repaired by :func:`heal`:

- crash before the park: a stray ``.compact-*`` dir; live intact.
- crash between park and rename-in: live missing, ``.old-`` holds the
  previous content — heal restores it.
- crash before the parked cleanup: live is the compacted content —
  heal removes the leftover ``.old-``.

``heal`` runs on index open (a crashed process reopens before it
probes) and at the start of every compaction pass. Readers in OTHER
processes racing a compaction can observe a missing directory for the
instant between the two renames — single-writer ownership per index,
the same contract every append already requires (two concurrent
appends to one Spark parquet directory are unsafe anyway). That
contract is now ENFORCED, not prose-only: every index mutation takes
:func:`writer_lock` (flock on ``<index root>/.writer.lock``) for the
call's duration, so a second writer process fails fast with a clear
error instead of racing the swap. Within one process the supported
topology is sequential: a probe DataFrame must be CREATED after the
last compaction (parquet file listings pin at read time, so a frame
created before the swap holds paths the swap renames away) — the
ingest loops comply by compacting inside the tick and serving probes
from fresh frames, pinned by
tests/test_streaming.py::test_probe_interleaved_with_compaction.
"""

from __future__ import annotations

import contextlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_OLD = ".old-"
_TMP = ".compact-"
_LOCK = ".writer.lock"


@contextlib.contextmanager
def writer_lock(root: str, blocking: bool = False):
    """Advisory per-index-root writer lock (flock, non-blocking).

    The index stores are single-writer by contract: two processes
    appending to one Spark parquet directory are unsafe, and a probe
    in ANOTHER process racing :func:`compact_dir`'s parked-previous
    swap can observe the live directory missing for the instant
    between the two renames. This lock makes the contract detectable
    instead of prose-only — every index mutation (append / build /
    maybe_compact) takes it for the call's duration, so a second
    WRITER process fails fast with a clear error rather than
    interleaving renames. Same-process sequential calls re-acquire
    freely (the lock is never held across calls), and readers are
    deliberately not serialized: within one process a probe created
    AFTER the last compaction is safe, which is the supported
    topology (the ingest loop compacts inside its tick, then serves
    probes from fresh DataFrames). A dotfile, so Spark directory
    listings and ``_data_files`` ignore it.

    ``blocking=True`` waits for the lock instead of failing — the
    index CONSTRUCTORS use it around their crash-repair ``heal()``:
    a reader process opening an index mid-compaction must not unpark
    the writer's in-flight swap (heal would see the parked dir and
    restore it between the two renames, crashing the lock-holding
    writer); waiting the few hundred ms until the swap completes
    makes open-for-read safe without serializing probes."""
    os.makedirs(root, exist_ok=True)
    fd = os.open(os.path.join(root, _LOCK), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        import fcntl

        try:
            fcntl.flock(
                fd,
                fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB),
            )
        except OSError as e:
            raise RuntimeError(
                f"{root}: another process holds the writer lock — the "
                "index stores are single-writer (concurrent appends / "
                "compactions would interleave renames)"
            ) from e
        yield
    finally:
        os.close(fd)  # closing the fd releases the flock


def locked_writer(method):
    """Decorator form of :func:`writer_lock` for the index classes'
    mutation methods — locks on ``self.path`` for the call's
    duration."""
    import functools

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        with writer_lock(self.path):
            return method(self, *args, **kwargs)

    return wrapper


def _data_files(d: str) -> list[str]:
    """Parquet data files directly inside ``d`` (Spark writes flat
    part-files per partition dir; _SUCCESS/_metadata/dotfiles are
    bookkeeping, not data)."""
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return []
    return [
        n
        for n in names
        if not n.startswith((".", "_")) and not n.endswith(".crc")
    ]


def dir_row_count(root: str) -> int:
    """Exact row count of a parquet directory tree from file footers —
    driver-side metadata reads, no Spark job (r14, guide §1.2/§5: the
    rebucket growth triggers ran a full count() job per tick just to
    compare against a threshold; parquet footers carry the identical
    number). Dot-dirs (parked/staged siblings) are skipped exactly as
    Spark's partition discovery skips them, so the count matches what
    a reader sees. Cost is O(data files) footer reads — the same
    listing the compaction trigger already pays every tick."""
    import pyarrow.parquet as papq

    total = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames if not d.startswith((".", "_"))
        ]
        for n in filenames:
            if n.startswith((".", "_")) or n.endswith(".crc"):
                continue
            total += papq.ParquetFile(
                os.path.join(dirpath, n)
            ).metadata.num_rows
    return total


def dir_fingerprint(*dirs: str) -> tuple:
    """Cheap state fingerprint of one or more directories (per-dir
    mtime_ns + entry count + per-entry mtime_ns) — the probe_local
    family's resident-cache invalidation key, ONE implementation for
    all four index stores (r13 review: four copy-pasted _sig helpers
    were a divergence hazard). Any append/delete/compaction/rebucket
    touches one of the fingerprinted dirs, so a changed tuple means
    "drop the cache and reload persisted meta"."""

    def _sig(d: str) -> tuple:
        try:
            names = sorted(os.listdir(d))
        except FileNotFoundError:
            return ()
        out = [os.stat(d).st_mtime_ns, len(names)]
        for n in names:
            try:
                out.append(os.stat(os.path.join(d, n)).st_mtime_ns)
            except FileNotFoundError:
                pass
        return tuple(out)

    return tuple(_sig(d) for d in dirs)


def probe_local_retry(state_attr: str):
    """Decorator closing the probe_local TOCTOU window (r13 advice),
    ONE implementation for all four index stores: the fingerprint and
    meta reload happen at call start, but the bucket parquet reads
    happen later — a compaction or rebucket COMPLETING in another
    process mid-call can raise FileNotFoundError (the park-and-swap
    deletes the listed files) or, for a rebucket, silently serve one
    answer computed at the old bucket modulus. The wrapper re-checks
    ``_local_store_state()`` AFTER the probe body ran; on a mid-call
    mutation (or a FileNotFoundError from a vanished part-file) it
    drops the resident cache via ``state_attr`` and replays the probe
    once from a fresh fingerprint + persisted-meta reload. A store
    that mutates again during the replay propagates normally — one
    retry bounds the cost; an endlessly-churning store is an
    operational problem, not a serving race.

    The post-check compares against the fingerprint the BODY cached
    in ``state_attr`` (every probe_local stores the state it served
    from there), so the wrapper adds exactly one directory-stat walk
    per call — and a probe that reloaded mid-call compares against
    its own fresh state, never replaying spuriously."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            try:
                out = fn(self, *args, **kwargs)
                # ONE post-read fingerprint walk (r14 review: a
                # pre-walk here tripled the directory stats on the
                # ms-class serving path): the body cached the
                # fingerprint it served from in ``state_attr``, so
                # comparing the CURRENT state against that detects
                # any mutation between the body's state read and the
                # end of its bucket reads.
                if self._local_store_state() == getattr(
                    self, state_attr, None
                ):
                    return out
            except FileNotFoundError:
                pass
            setattr(self, state_attr, None)
            return fn(self, *args, **kwargs)

        return wrapper

    return deco


def heal(root: str) -> None:
    """Repair a crashed compaction under ``root`` (module docstring).
    Parked dirs restore when their live twin is missing (crash between
    the two renames), otherwise drop (the swap completed); stray
    ``.compact-*`` temp dirs always drop (never renamed in)."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    # parked dirs FIRST: a crash between park and rename-in leaves
    # both `.old-X` and `.compact-X`; restoring before sweeping temps
    # keeps the store at its pre-compaction content
    for n in names:
        if n.startswith(_OLD):
            live = os.path.join(root, n[len(_OLD):])
            parked = os.path.join(root, n)
            if os.path.isdir(live):
                shutil.rmtree(parked)
            else:
                os.rename(parked, live)
    for n in names:
        if n.startswith(_TMP) and os.path.isdir(os.path.join(root, n)):
            shutil.rmtree(os.path.join(root, n))


def compact_dir(
    spark: SparkSession,
    root: str,
    name: str,
    schema: str,
    fold,
    order_by: list[str],
) -> None:
    """Rewrite one directory's file-sets as a single sorted file via
    the parked-previous swap. ``fold(df) -> df`` collapses rows that
    accumulated across appends (duplicate membership/postings rows);
    ``order_by`` sorts the survivors so the single output file is
    run-length-friendly and min/max-stat-prunable on its sort key."""
    live = os.path.join(root, name)
    tmp = os.path.join(root, _TMP + name)
    parked = os.path.join(root, _OLD + name)
    df: DataFrame = spark.read.schema(schema).parquet(live)
    out = fold(df).orderBy(*order_by).coalesce(1)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(live, parked)
    os.rename(tmp, live)
    shutil.rmtree(parked)


def compact_partitioned(
    spark: SparkSession,
    root: str,
    prefix: str,
    schema: str,
    fold,
    order_by: list[str],
    max_files: int = 8,
    budget: int | str | None = None,
) -> int:
    """Compact every ``<prefix>=<value>`` partition directory under
    ``root`` holding more than ``max_files`` data files; heal first.
    ``schema`` describes the rows WITHOUT the partition column (each
    leaf dir is read directly, so the partition value lives only in
    the directory name and survives the rewrite untouched). Returns
    the number of directories compacted — the amortized contract is
    one rewrite of a bucket per ``max_files`` appends to it, so probe
    file-listing cost stays O(buckets), not O(ticks).

    ``budget`` caps the rewrites PER CALL (r13, VERDICT r12 #2): a
    uniform drop touches ~every bucket, so all of them cross the
    ``max_files`` threshold in the SAME tick and an unbounded pass
    becomes a whole-store rewrite stalling the ingest loop (the
    classic unstaggered-LSM burst — ~122 s vs ~10 s steady in the
    21-tick SCALE table). With a budget the pass folds only the
    ``budget`` FATTEST eligible dirs (file-count desc, name asc —
    deterministic, and self-balancing without any persisted cursor:
    a deferred dir keeps accumulating files and rises to the top,
    so nothing starves). Probes stay correct throughout — a
    not-yet-compacted list is just more files to read — and
    maintenance cost amortizes to ≤ budget rewrites per tick.

    ``budget="auto"`` self-sizes to the store's EQUILIBRIUM bound,
    ``max(32, ceil(n_dirs / max_files))``: uniform drops push
    ~n_dirs/max_files dirs over the threshold per tick, so any
    smaller cap lets the backlog grow without bound while any larger
    one only front-loads work — the ingest ticks default to this so
    a store of any bucket count drains exactly as fast as it
    fattens. An explicit int is taken literally (tests pin exact
    fold counts).

    Fold contract (r14): ``fold`` receives the rows WITH the
    ``prefix`` partition column and must key on it (every store's
    fold key already functionally determines its bucket, so adding
    the column to the groupBy/window keys is a no-op on results) —
    that is what lets ALL eligible directories rewrite in ONE Spark
    job instead of a job per directory (r14, guide §2.6/§1.2: the
    per-dir loop serialized N tiny jobs per maintenance pass; one
    partitioned read + one shuffle on the partition column + one
    partitioned write does the same rewrites with one job's
    scheduling cost, at any bucket count). The staged output lands
    under one dot-prefixed sibling and then swaps in PER DIRECTORY
    with the same park-and-swap windows as before (``heal`` repairs
    a crash at any point: parked dirs restore, the staging root
    sweeps)."""
    import math

    heal(root)
    if not os.path.isdir(root):
        return 0
    eligible: list[tuple[int, str]] = []
    n_dirs = 0
    for n in sorted(os.listdir(root)):
        if not n.startswith(prefix + "="):
            continue
        n_dirs += 1
        k = len(_data_files(os.path.join(root, n)))
        if k <= max_files:
            continue
        eligible.append((k, n))
    if budget == "auto":
        budget = max(32, math.ceil(n_dirs / max(max_files, 1)))
    if budget is not None:
        eligible.sort(key=lambda t: (-t[0], t[1]))
        eligible = eligible[: max(0, budget)]
    if not eligible:
        return 0
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    names = [n for _, n in eligible]
    stage = os.path.join(root, _TMP + "batchfold")
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    # callers pass the row schema as a DDL string or a StructType;
    # extend either with the partition column
    if isinstance(schema, str):
        full_schema: str | T.StructType = f"{schema}, {prefix} int"
    else:
        full_schema = T.StructType(
            [*schema.fields, T.StructField(prefix, T.IntegerType(), True)]
        )
    df = (
        spark.read.schema(full_schema)
        .option("basePath", root)
        .parquet(*[os.path.join(root, n) for n in names])
    )
    # one task per bucket value (hash collisions merely co-locate two
    # buckets in a task; the partitioned write still emits one file
    # per directory), rows sorted within each output file
    (
        fold(df)
        .repartition(F.col(prefix))
        .sortWithinPartitions(prefix, *order_by)
        .write.partitionBy(prefix)
        .parquet(stage)
    )
    done = 0
    try:
        drained = [
            n for n in names if not os.path.isdir(os.path.join(stage, n))
        ]
        if drained:
            # the fold eliminated every row of these buckets (e.g. ANN
            # lists whose rows were all superseded). A BARE directory
            # here would break schema inference on the whole store once
            # every bucket drains (r15 ADVICE: _read_postings-style
            # root reads raise "Unable to infer schema") — the old
            # per-dir compact_dir left a schema-bearing zero-row part
            # file, so this path must too. One 0-row write with the
            # data schema (df minus the partition column, so column
            # order matches the partitioned write's leaf files), copied
            # into each drained bucket.
            tmpl = os.path.join(stage, "_empty_template")
            (
                df.limit(0)
                .drop(prefix)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmpl)
            )
            parts = _data_files(tmpl)
            if len(parts) != 1:
                raise RuntimeError(
                    f"empty-bucket template wrote {len(parts)} part "
                    f"files in {tmpl!r}; expected exactly 1"
                )
            for n in drained:
                src = os.path.join(stage, n)
                os.makedirs(src)
                shutil.copy2(
                    os.path.join(tmpl, parts[0]),
                    os.path.join(src, parts[0]),
                )
        for n in names:
            src = os.path.join(stage, n)
            live = os.path.join(root, n)
            parked = os.path.join(root, _OLD + n)
            os.rename(live, parked)
            os.rename(src, live)
            shutil.rmtree(parked)
            done += 1
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return done


def commit_relayout(
    path: str, data_dirnames: list[str], new_meta: dict
) -> None:
    """Crash-safe whole-directory re-layout commit (r9 — the
    ``maybe_rebucket`` family's swap): the caller has already written
    a ``.compact-<name>`` sibling for every name in ``data_dirnames``
    holding the NEW layout; this stamps each with the new meta's md5
    (a ``.layout_md5`` dotfile), stages the new meta as
    ``meta/meta.json.new``, parks EVERY live dir, renames every
    replacement in, and commits with ONE atomic ``os.replace`` of the
    meta — parked dirs are removed only after the commit, so
    :func:`resolve_relayout` can always roll a pre-commit crash back.
    The store is observably entirely-old or entirely-new at every
    open."""
    import hashlib
    import json

    payload = json.dumps(new_meta, sort_keys=True).encode()
    digest = hashlib.md5(payload).hexdigest()
    for d in data_dirnames:
        tmp = os.path.join(path, _TMP + d)
        if not os.path.isdir(tmp):
            raise ValueError(
                f"commit_relayout: replacement dir {tmp!r} missing"
            )
        with open(os.path.join(tmp, ".layout_md5"), "w") as f:
            f.write(digest)
    staged = os.path.join(path, "meta", "meta.json.new")
    os.makedirs(os.path.dirname(staged), exist_ok=True)
    with open(staged + ".tmp", "wb") as f:
        f.write(payload)
    os.replace(staged + ".tmp", staged)
    # park all lives first, then swap all replacements in — the
    # rollback branch of resolve_relayout depends on every swapped
    # dir's parked twin existing until the meta commit
    for d in data_dirnames:
        os.rename(os.path.join(path, d), os.path.join(path, _OLD + d))
    for d in data_dirnames:
        os.rename(os.path.join(path, _TMP + d), os.path.join(path, d))
    os.replace(staged, os.path.join(path, "meta", "meta.json"))  # COMMIT
    for d in data_dirnames:
        shutil.rmtree(os.path.join(path, _OLD + d))


def resolve_relayout(path: str, data_dirnames: list[str]) -> None:
    """Roll an in-flight :func:`commit_relayout` forward or back at
    open — run BEFORE the meta fingerprint check and before generic
    :func:`heal`. A staged ``meta.json.new`` whose md5 matches EVERY
    data dir's ``.layout_md5`` marker means the swap completed and
    only the commit crashed: roll forward. Anything else rolls back —
    dirs already carrying the new layout restore from their parked
    twins (which outlive any pre-commit crash by construction), dirs
    never swapped are left for heal, and the staged meta drops."""
    staged = os.path.join(path, "meta", "meta.json.new")
    if not os.path.exists(staged):
        return
    import hashlib

    with open(staged, "rb") as f:
        want = hashlib.md5(f.read()).hexdigest()

    def marker(d: str) -> str | None:
        try:
            with open(os.path.join(path, d, ".layout_md5")) as f:
                return f.read().strip()
        except OSError:
            return None

    if all(marker(d) == want for d in data_dirnames):
        os.replace(staged, os.path.join(path, "meta", "meta.json"))
        return
    for d in data_dirnames:
        if marker(d) == want:
            parked = os.path.join(path, _OLD + d)
            live = os.path.join(path, d)
            if not os.path.isdir(parked):
                raise RuntimeError(
                    f"resolve_relayout: {live!r} holds an uncommitted "
                    "new layout but its parked previous is gone — "
                    "store needs manual repair"
                )
            shutil.rmtree(live)
            os.rename(parked, live)
    os.remove(staged)


def compact_flat(
    spark: SparkSession,
    path: str,
    schema: str,
    fold,
    order_by: list[str],
    max_files: int = 8,
) -> bool:
    """Compact an UNpartitioned append-parquet directory (the roster /
    stats side-tables) with the same swap, treating the directory
    itself as the unit: the rewrite lands in a dot-prefixed sibling
    and swaps in under the parent. Returns True if compacted."""
    parent, name = os.path.split(os.path.normpath(path))
    heal(parent)
    if len(_data_files(path)) <= max_files:
        return False
    compact_dir(spark, parent, name, schema, fold, order_by)
    return True
