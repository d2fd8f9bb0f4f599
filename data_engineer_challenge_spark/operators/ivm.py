"""Incremental view maintenance: a groupBy aggregate kept up to date
from a SnapshotTable's change feed — including retractions.

The naive way to keep ``SELECT k, count(*), sum(v) GROUP BY k``
current is to recompute it per tick — O(source) every time, the cost
that makes dashboards over 100 TB tables impossible. Self-maintainable
aggregates (COUNT / SUM — and AVG as sum/count at read time) admit
classic IVM (Blakeley et al., SIGMOD'86): aggregate ONLY the delta,
then fold it into the stored view. Per tick this touches:

- the CHANGED rows (``source.read_changes_signed`` — exactly the
  directories the range's commits added or removed, each row tagged
  ``__sign`` ±1; rewritten-but-unchanged survivors cancel),
- the view rows for the TOUCHED groups (a stats-pruned
  ``target.read(where=envelope)``),
- and a ``target.merge`` whose copy-on-write carries every directory
  outside the touched-group envelope untouched.

Cost ∝ delta + touched groups, never source size or full view size.

Subtractive maintenance: COUNT folds ``sum(sign)``, SUM folds
``sum(sign * v)`` — so source deletes (``delete_where``), keyed
merges, even a replace, maintain the view without a full recompute of
anything but the data those commits physically rewrote. A group whose
folded count reaches zero is DELETED from the view (the merge's
``deletes`` channel); a negative folded count means the feed and view
disagree and raises rather than corrupting silently.

Progress rides the target's own manifest (txn map + the untrimmed
``cursors`` field): the fold commits under txn
``{prefix}-{source_version}``, so a replayed tick is a silent no-op
and cursor-vs-data desync is impossible — correctness never depends
on a side file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: hash-bucket column persisted in the maintained view (dropped by
#: read_view): the fold's pruning key when group keys are unclustered
BUCKET_COL = "__kb"


class IncrementalAgg:
    def __init__(
        self,
        spark: SparkSession,
        source,  # operators.snapshot.SnapshotTable
        target,  # operators.snapshot.SnapshotTable (the maintained view)
        group_cols: list[str],
        sum_cols: list[str],
        txn_prefix: str = "ivm",
        n_buckets: int = 64,
    ) -> None:
        """``n_buckets`` — the view is stored with a persisted
        ``__kb = hash(group keys) % n_buckets`` column and each commit
        is range-clustered on it, so a tick's fold prunes the view to
        the TOUCHED BUCKETS (an ``in``-set proof over per-file stats)
        regardless of how the raw group keys interleave — a min/max
        envelope over an unclustered key space spans the whole view
        and would degrade the fold to a full read/rewrite (the
        ``bh_bucket`` pattern from operators.dedup_index).

        The layout parameters are PINNED in a sidecar
        (``<view>/ivm_meta.json``, written before the first tick —
        the IVFVectorIndex meta.json pattern): ``__kb`` stamps are
        only sound pruning proofs while every writer uses the same
        ``n_buckets`` and group keys, so reopening with different
        values raises instead of silently excluding old rows from
        folds (duplicate group rows, no error — the worst kind)."""
        import json
        import os

        self.spark = spark
        self.source = source
        self.target = target
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.txn_prefix = txn_prefix
        self.n_buckets = int(n_buckets)
        self._meta = {
            "n_buckets": self.n_buckets,
            "group_cols": self.group_cols,
            "sum_cols": self.sum_cols,
        }
        self._meta_path = os.path.join(target.path, "ivm_meta.json")
        self._needs_layout_adoption = False
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                stored = json.load(f)
            if stored != self._meta:
                raise ValueError(
                    f"IncrementalAgg view at {target.path!r} was laid "
                    f"out with {stored}; reopening with {self._meta} "
                    "would stamp mismatched __kb values and silently "
                    "corrupt the fold's pruning proofs"
                )
        elif target.current_version() is None:
            # fresh view: pin the layout before any data exists
            self._write_meta()
        else:
            # a PRE-SIDECAR view with data: its stamps may come from a
            # different n_buckets, a pre-bucketing maintainer (no __kb
            # at all), or the half-upgraded mix of both — none of
            # which this instance can distinguish. Writing the sidecar
            # now would PIN the current params against unknown stamps,
            # the exact silent corruption the sidecar exists to stop;
            # instead the next fold restamps the whole view under this
            # layout and only then pins it (_adopt_layout).
            self._needs_layout_adoption = True

    def _write_meta(self) -> None:
        import json
        import os

        os.makedirs(self.target.path, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._meta, f)
        os.replace(tmp, self._meta_path)

    def _adopt_layout(self) -> None:
        """One-time O(view) restamp bringing a pre-sidecar view under
        this instance's layout, then pin it. Restamping FIRST makes
        the ordering crash-safe: a crash after the replace but before
        the sidecar write re-runs the (idempotent) restamp on the
        next fold; the reverse order would pin unverified stamps.
        replace() preserves the txn map and cursors (_publish carries
        both on every commit), so progress cannot desync."""
        if self.target.current_version() is not None:
            body = self.target.read()
            if BUCKET_COL in body.columns:
                body = body.drop(BUCKET_COL)
            self.target.replace(
                self._with_bucket(body).repartitionByRange(
                    self.n_buckets, BUCKET_COL
                )
            )
        self._write_meta()
        self._needs_layout_adoption = False

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET_COL,
            F.pmod(
                F.xxhash64(*self.group_cols), F.lit(self.n_buckets)
            ).cast("int"),
        )

    def read_view(self) -> DataFrame:
        """The maintained view without its layout column."""
        return self.target.read().drop(BUCKET_COL)

    def _aggregate_signed(self, df: DataFrame) -> DataFrame:
        """Sign-weighted partial aggregate of a ``__sign``-tagged
        change feed: COUNT ← sum(sign), SUM ← sum(sign·v). A +1 feed
        (plain appends) degenerates to the ordinary aggregate."""
        return df.groupBy(*self.group_cols).agg(
            F.sum("__sign").cast("long").alias("n_rows"),
            *[
                F.sum(F.col(c) * F.col("__sign")).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )

    def tick(self) -> int | None:
        """Fold everything the source committed since the last tick
        into the view. Returns the new target version, or None if
        nothing new (or a replay already folded this range)."""
        from .snapshot import envelope_literal, txn_cursor

        cur = self.source.current_version()
        if cur is None:
            return None
        cursor = txn_cursor(self.target, self.txn_prefix)
        tv = self.target.current_version()
        if cursor >= cur:
            return None
        raw = self.source.read_changes_signed(cursor, cur)
        delta_all = self._with_bucket(self._aggregate_signed(raw))
        # null group keys have no null-safe path through the semi-join
        # + keyed merge below (null == null is never true), so a null
        # key would silently accumulate duplicate partial rows — fail
        # fast instead; callers coalesce to a sentinel upstream. The
        # check runs on the aggregated delta (one row per group, a few
        # KB, already materialized), NOT the raw feed — a raw-side
        # check would cost a second delta-sized scan per tick, which
        # at 100 TB is the single biggest line in the tick's budget.
        import functools

        any_null = functools.reduce(
            lambda a, k: a | F.col(k).isNull(),
            self.group_cols,
            F.lit(False),
        )
        # drop groups the range did not NET-change (pure rewrites —
        # compact/optimize/restore, merge-carried survivors): folding
        # them would read and rewrite view rows for nothing
        noop = (F.col("n_rows") == 0) & functools.reduce(
            lambda a, c: a & (F.coalesce(F.col(f"sum_{c}"), F.lit(0)) == 0),
            self.sum_cols,
            F.lit(True),
        )
        # ALL per-tick decisions ride the delta's own checkpoint as
        # observed metrics (r15 — previously r14's single collect job
        # over the checkpointed frame; now ZERO extra jobs): the
        # null-key guard, the empty-after-noop check, the
        # touched-bucket set, and the group-key envelope all compute
        # during the same action that materializes the delta. The
        # conditional aggregates (collect_set/min/max over
        # when(~noop, ...)) skip null inputs, so noop rows vanish from
        # the proofs exactly as the old delta-side aggregate had it.
        from pyspark.sql.observation import Observation

        env_obs = Observation()
        delta_all = delta_all.observe(
            env_obs,
            F.count(F.when(any_null, 1)).alias("__nulls"),
            F.count(F.when(~noop, 1)).alias("__n_delta"),
            F.collect_set(F.when(~noop, F.col(BUCKET_COL))).alias("__kbs"),
            *[
                f
                for k in self.group_cols
                for f in (
                    F.min(F.when(~noop, F.col(k))).alias(f"__lo_{k}"),
                    F.max(F.when(~noop, F.col(k))).alias(f"__hi_{k}"),
                )
            ],
        ).localCheckpoint()
        delta = delta_all.where(~noop)
        env = env_obs.get
        if env["__nulls"]:
            raise ValueError(
                f"null values in group columns {self.group_cols}: "
                "additive IVM requires non-null group keys (coalesce "
                "to a sentinel upstream)"
            )
        if env["__n_delta"] == 0:
            # empty delta (e.g. an empty streaming batch committed an
            # empty source version): advance the cursor with an empty
            # APPEND — folding would rewrite the whole view through an
            # unconstrained merge for zero rows
            return self.target.append(
                delta,
                txn=f"{self.txn_prefix}-{cur}",
                cursor=(self.txn_prefix, cur),
            )
        if tv is None:
            # bootstrap: range-cluster on the bucket column so each
            # file carries a tight __kb range — what every later
            # tick's in-set proof prunes against
            return self.target.append(
                delta.repartitionByRange(self.n_buckets, BUCKET_COL),
                txn=f"{self.txn_prefix}-{cur}",
                cursor=(self.txn_prefix, cur),
            )
        # fold: existing rows for the touched groups + the delta, then
        # a keyed merge. The view is pruned to the TOUCHED BUCKETS
        # (in-set stats proof — clustering-independent) plus the
        # group-key range envelope (free extra proof when keys happen
        # to cluster); directories outside both are carried by merge's
        # stats pruning without being read OR rewritten.
        # pre-sidecar view (unknown stamp provenance: unbucketed,
        # differently-bucketed, or half-upgraded NULL-stamp mix)?
        # Restamp + pin it before the first fold that relies on the
        # stamps — merely skipping the bucket filter for one tick is
        # not enough: that tick's merge evolves the schema while old
        # rows keep NULL stamps, and the NEXT tick's exact
        # `__kb in touched` filter drops NULL rows before any
        # restamp-on-read can heal them, silently losing counts.
        if self._needs_layout_adoption:
            self._adopt_layout()
            tv = self.target.current_version()
        touched = sorted(env["__kbs"])
        where = [(BUCKET_COL, "in", touched)]
        for k in self.group_cols:
            lo = envelope_literal(env[f"__lo_{k}"])
            hi = envelope_literal(env[f"__hi_{k}"])
            if lo is not None and hi is not None:
                where.extend([(k, ">=", lo), (k, "<=", hi)])
        # ALWAYS restamp the bucket on read (deterministic from the
        # group keys — a no-op after the upgrade above, kept as a
        # guard against any out-of-band writer) and guarantees the
        # groupBy below never splits a group across bucket values
        existing = self._with_bucket(
            self.target.read(where=where or None).drop(BUCKET_COL)
        ).join(
            F.broadcast(delta.select(*self.group_cols)),
            self.group_cols,
            "left_semi",
        )
        # the negative-count guard rides the fold's checkpoint as an
        # observed metric (r15, guide §2.6): the old separate
        # limit(1).count() job per tick re-scanned the checkpoint just
        # to validate it
        from pyspark.sql.observation import Observation

        obs = Observation()
        folded = (
            existing.unionByName(delta)
            .groupBy(*self.group_cols, BUCKET_COL)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            .observe(
                obs,
                F.count(F.when(F.col("n_rows") < 0, 1)).alias("__neg"),
            )
            .localCheckpoint()
        )
        # a negative folded count means the feed retracted rows the
        # view never absorbed — corrupt state; refuse to commit it
        if obs.get["__neg"]:
            raise ValueError(
                "subtractive fold drove a group count below zero — "
                "change feed and view disagree (was the view edited "
                "outside this maintainer?); rebuild the view"
            )
        # range-cluster the rewrite on the bucket so its files carry
        # tight __kb stats for future in-set proofs
        upserts = folded.where(F.col("n_rows") > 0).repartitionByRange(
            max(len(touched), 1), BUCKET_COL
        )
        return self.target.merge(
            upserts,
            keys=self.group_cols,
            in_cols=[BUCKET_COL],
            txn=f"{self.txn_prefix}-{cur}",
            cursor=(self.txn_prefix, cur),
            # groups whose last row was retracted leave the view
            deletes=folded.where(F.col("n_rows") == 0).select(
                *self.group_cols, BUCKET_COL
            ),
        )
