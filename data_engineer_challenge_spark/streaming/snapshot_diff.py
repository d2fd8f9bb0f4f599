"""Snapshot-diff change detection (SURVEY.md §2.7 T1-T3, §4.4;
reference script.py:18-57).

Spark's file streaming source tracks *new* files only; the reference
also reacts to modified and deleted files. This is a deliberately tiny
utility, not a framework: a snapshot is ``{path: mtime_ns}``, the state
persists as JSON next to the warehouse, and a diff classifies paths.
Listing is driver-side — exactly how Spark's own file source lists —
so it scales with file count, not data volume.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class DirDiff:
    new: tuple[str, ...] = ()
    modified: tuple[str, ...] = ()
    deleted: tuple[str, ...] = ()

    @property
    def changed(self) -> bool:
        return bool(self.new or self.modified or self.deleted)


def take_snapshot(directory: str, extensions: tuple[str, ...] = (".pdf", ".docx")) -> dict[str, int]:
    """{filename: mtime_ns} for matching files (script.py:18-32)."""
    snap: dict[str, int] = {}
    try:
        with os.scandir(directory) as it:
            for entry in it:
                if entry.is_file() and entry.name.lower().endswith(extensions):
                    snap[entry.name] = entry.stat().st_mtime_ns
    except FileNotFoundError:
        pass
    return snap


def diff_snapshots(prev: dict[str, int], cur: dict[str, int]) -> DirDiff:
    """new = cur − prev, deleted = prev − cur, modified = mtime changed
    (script.py:35-57)."""
    new = tuple(sorted(set(cur) - set(prev)))
    deleted = tuple(sorted(set(prev) - set(cur)))
    modified = tuple(
        sorted(name for name in set(cur) & set(prev) if cur[name] != prev[name])
    )
    return DirDiff(new=new, modified=modified, deleted=deleted)


@dataclass
class SnapshotState:
    """Persisted snapshot state (the streaming 'offset log').

    ``counters`` persists monotonic sequence numbers (batch number,
    upload ids) alongside the offsets: a restart that resumed offsets
    but reset upload ids would re-stamp old warehouse rows with
    regressed lineage values and collide quarantine keys from earlier
    runs — the counter IS part of the stream's committed state."""

    path: str
    snapshots: dict[str, dict[str, int]] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "SnapshotState":
        if os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            # an explicit version marker, not shape-sniffing: the old
            # sniff ("does a 'snapshots' key exist?") would misread a
            # legacy file that happened to track a directory literally
            # named 'snapshots', silently dropping every other
            # directory's offsets on upgrade
            if raw.get("v") == 2:
                return cls(
                    path=path,
                    snapshots=raw["snapshots"],
                    counters=raw.get("counters", {}),
                )
            # marker-less {"snapshots": ..., "counters": ...} shape
            # (written briefly before the marker existed): recognized
            # only when nothing but those keys is present AND the
            # snapshots values are per-directory dicts — a legacy file
            # tracking a directory literally named "snapshots" fails
            # both tests (its values are file mtimes, and it usually
            # tracks other directories too) and falls through intact
            if set(raw) <= {"snapshots", "counters"} and all(
                isinstance(v, dict) for v in raw.get("snapshots", {}).values()
            ):
                return cls(
                    path=path,
                    snapshots=raw.get("snapshots", {}),
                    counters=raw.get("counters", {}),
                )
            # pre-marker file format: the whole document is snapshots
            return cls(path=path, snapshots=raw)
        return cls(path=path)

    def save(self) -> None:
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"v": 2, "snapshots": self.snapshots, "counters": self.counters},
                f,
            )
        os.replace(tmp, self.path)

    def peek(
        self, key: str, directory: str, extensions: tuple[str, ...] = (".pdf", ".docx")
    ) -> tuple[DirDiff, dict[str, int]]:
        """Diff the directory against the stored snapshot WITHOUT
        advancing it. Callers run their batch, then pass the returned
        snapshot to :meth:`commit` — so a batch that throws leaves the
        trigger armed and the retry re-sees the same change (the
        'offset is committed after the batch' rule every streaming
        engine follows). First peek reports everything as new."""
        cur = take_snapshot(directory, extensions)
        return diff_snapshots(self.snapshots.get(key, {}), cur), cur

    def commit(self, key: str, snapshot: dict[str, int]) -> None:
        """Advance the stored snapshot after a successful batch (call
        :meth:`save` to persist)."""
        self.snapshots[key] = snapshot

    def poll(
        self, key: str, directory: str, extensions: tuple[str, ...] = (".pdf", ".docx")
    ) -> DirDiff:
        """peek + immediate commit — for callers with no failure
        window between diff and processing."""
        diff, cur = self.peek(key, directory, extensions)
        self.commit(key, cur)
        return diff
