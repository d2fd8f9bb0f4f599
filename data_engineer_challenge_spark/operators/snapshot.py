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
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


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
        with open(self._manifest_path(version)) as f:
            return json.load(f)

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

    def _publish(self, build_manifest, retries: int = 20, txn: str | None = None) -> int | None:
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

    def _write_commit_dir(self, df: DataFrame) -> str:
        cdir = f"c-{uuid.uuid4().hex}"
        df.write.parquet(os.path.join(self._data_dir(), cdir))
        return cdir

    # -- public API --------------------------------------------------

    def append(self, df: DataFrame, txn: str | None = None) -> int | None:
        """Add rows; returns the committed version.

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
        cdir = self._write_commit_dir(df)

        def build(current: int | None) -> dict:
            dirs = [] if current is None else self._manifest(current)["dirs"]
            m = {"op": "append", "dirs": [*dirs, cdir]}
            if txn is not None:
                m["txn"] = txn
            return m

        return self._publish(build, txn=txn)

    def replace(self, df: DataFrame) -> int:
        """Replace the table contents; returns the committed version."""
        cdir = self._write_commit_dir(df)
        return self._publish(lambda current: {"op": "replace", "dirs": [cdir]})

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: resolve ONE manifest, read exactly its
        directories. Stable under concurrent commits; ``version=``
        time-travels."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"SnapshotTable at {self.path!r} is empty")
        dirs = self._manifest(v)["dirs"]
        if not dirs:
            raise FileNotFoundError(f"version {v} holds no data")
        return self.spark.read.parquet(
            *[os.path.join(self._data_dir(), d) for d in dirs]
        )

    def compact(self) -> int:
        """Fold the accumulated commit directories into one (the
        manifest grows with commit count, not data size — compaction
        resets that and merges small files)."""
        return self.replace(self.read())

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
