"""The end-to-end corpus-release capstone (VERDICT r11 #8).

One registered query that composes the release pipeline every public
LLM-data recipe ships — heuristic filter bank → curation funnel →
leakage-safe split → decontaminated train → shuffled packing — under a
SINGLE driver hash. Every stage is individually oracled elsewhere in
this registry; this row proves the COMPOSITION is exact by chaining
the stages' own SQL (the filter bank's and the cluster split's oracles
are embedded VERBATIM — pulled from the registry at import time, so
they cannot drift — and the funnel runs through the shared
``funnel_sql(src)`` literal the batch/delta driver rows carry).

Reference parity: the reference pipeline's release step is a single
``to_sql`` append of whatever survived its dropna (exo_2.py:249-259);
this is the curated, split, decontaminated, training-ordered corpus a
100 TB pipeline actually publishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from ..functions.tokenize import TOKEN_RE, word_tokens as tokens
from ..tables import load_table
from . import REGISTRY, register
from .dedup import docs_leakage_safe_split
from .helpers import MD5_LONG_SQL, md5_long
from .text import (
    _FP_CAP,
    _FP_MIN_SHARED,
    _FP_SEL_SQL,
    _GSHUF_SALT,
    _GSHUF_SHARDS,
    _PACK_LEN,
    _winnow_fingerprints,
    curation_funnel,
    filter_bank_flags,
    funnel_sql,
)

# Stage oracles chained verbatim: registration already ran for these
# modules (plans/__init__._load imports them before this one), so the
# strings here ARE the strings the stages' own correctness rows carry.
_FB_ORACLE = REGISTRY["docs_heuristic_filter_bank"].oracle
_SPLIT_ORACLE = REGISTRY["docs_leakage_safe_split"].oracle

#: The release gate's rule configuration: every Gopher rule EXCEPT the
#: stop-word floor. The stop-list is language-specific (Gopher applies
#: its English list to English text only — Rae et al. 2021 §A1.1);
#: over this multilingual synthetic corpus the English list matches
#: nothing and would empty the release, so the capstone configures the
#: bank the way a real multilingual pipeline does. The flags still all
#: come from the bank's own embedded oracle — only the conjunction is
#: configured.
_RELEASE_RULES = (
    "ok_word_count",
    "ok_mean_word_len",
    "ok_symbol_ratio",
    "ok_bullet_lines",
    "ok_ellipsis_lines",
    "ok_alpha_words",
)
_RELEASE_GATE_SQL = " AND ".join(f"{r} = 1" for r in _RELEASE_RULES)

_RELEASE_ORACLE = f"""
    WITH {_FP_SEL_SQL},
    fbdocs AS (
        SELECT d.* FROM documents d
        JOIN (SELECT doc_id FROM ({_FB_ORACLE})
              WHERE {_RELEASE_GATE_SQL}) fb
          USING (doc_id)
    ),
    mix AS ({funnel_sql("fbdocs")}),
    splits AS ({_SPLIT_ORACLE}),
    rare AS (
        SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= {_FP_CAP}
    ),
    tmix AS (
        SELECT m.* FROM mix m JOIN splits s USING (doc_id)
        WHERE s.split = 'train'
    ),
    contaminated AS (
        SELECT a.doc_id
        FROM sel a JOIN sel b USING (fp) JOIN rare USING (fp)
             JOIN tmix t ON t.doc_id = a.doc_id
             JOIN splits sb ON sb.doc_id = b.doc_id
        WHERE sb.split = 'heldout'
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {_FP_MIN_SHARED}
    ),
    released AS (
        SELECT * FROM tmix
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    hashed AS (
        SELECT r.doc_id, r.lang, r.quality_score, r.log_weight,
               {MD5_LONG_SQL.format(
                   c="concat('" + _GSHUF_SALT
                   + "', CAST(r.doc_id AS VARCHAR))")} AS h,
               CAST(len(regexp_extract_all(lower(d.text), '{TOKEN_RE}'))
                    AS BIGINT) AS n_tokens
        FROM released r JOIN documents d USING (doc_id)
    ),
    ranked AS (
        SELECT doc_id, lang, quality_score, log_weight, n_tokens,
               h % {_GSHUF_SHARDS} AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY h % {_GSHUF_SHARDS}
                   ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM hashed WHERE n_tokens > 0
    ),
    packed AS (
        SELECT *, COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM ranked
    )
    SELECT doc_id, lang, quality_score, log_weight, n_tokens,
           shard_id, pos,
           CAST(cum_before // {_PACK_LEN} AS BIGINT) AS seq_id,
           CAST(cum_before % {_PACK_LEN} AS BIGINT) AS seq_offset
    FROM packed
    """


@register(
    "docs_corpus_release",
    # r12: the 50th driver row (VERDICT r11 #8) — the whole release
    # pipeline under one hash; every stage's SQL is the stage's own
    # registered oracle, chained
    oracle=_RELEASE_ORACLE,
)
def docs_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeled end-to-end corpus release: every released document
    with its selection evidence (quality score, DSIR log-weight) and
    its training-order placement (shard, position, packed sequence).

    Stage chain, each the registry's own operator applied to the
    previous stage's survivors:

    1. **Heuristic filter bank** (``docs_heuristic_filter_bank``) —
       the Gopher rule gates, applied INLINE over the corpus
       (map-only; ``filter_bank_flags``).
    2. **Curation funnel** (``curation_funnel`` — quality gate, exact
       dedup, DSIR top-k) over the keepers only: the funnel's
       selection statistics are computed over filtered survivors, the
       composition property a wrong pipeline breaks.
    3. **Leakage-safe split** (``docs_leakage_safe_split``) — split
       assignment keyed on the FULL corpus's near-dup clusters (the
       cluster structure must not depend on what filtering kept);
       the release takes the train side.
    4. **Decontamination** (``split_contamination_pairs``'s winnowing
       machinery) — a train-side document is dropped iff it shares
       >= {_FP_MIN_SHARED} rare passage fingerprints with ANY
       held-out-side document of the full corpus: the eval pool is
       the frozen asset, so the train copy is what goes.
    5. **Shuffled packing** (``docs_shuffled_packing``'s layout) —
       the released documents get the salted-hash epoch order and
       concat-then-chunk ``(seq_id, seq_offset)`` placement, ranks
       computed WITHIN the release (the dataloader reads only
       released sequences).

    Scale shape: stages 1-2 are the funnel's audited shape over
    strictly-shrinking survivor sets; stage 3 adds the cluster tier's
    banded-candidate cost (ids-only label propagation); stage 4 is an
    ids-only fingerprint equi-join with rare-fp suppression; stage 5
    is two windows over ONE shard partitioning. No stage re-reads
    text except the final token count, which joins released ids
    (mix-capped) back to the corpus — a broadcast-sized join at any
    scale."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. filter bank, inline flags (map-only); the release's rule
    # configuration (_RELEASE_RULES — the bank minus the language-
    # specific stop-word floor)
    gate = None
    for r in _RELEASE_RULES:
        cond = F.col(r) == 1
        gate = cond if gate is None else gate & cond
    filtered = (
        filter_bank_flags(docs, carry=("lang", "text"))
        .where(gate)
        .select("doc_id", "lang", "text")
    )
    # 2. funnel over keepers
    mix = curation_funnel(filtered)
    # 3. cluster-keyed split over the FULL corpus
    splits = docs_leakage_safe_split(spark, sf_dir)
    # tmix feeds BOTH the decontamination join and the released
    # anti-join; without the (lazy) checkpoint one action would run
    # the filter bank + funnel twice (r12 review — the
    # emb_ann_recall_report shared-subplan fix, applied here)
    tmix = mix.join(
        splits.where(F.col("split") == "train").select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=False)
    # 4. decontaminate train-side mix against the held-out pool
    # both sides of the contamination join read this frame — the
    # lazy checkpoint keeps the winnowing scan to one execution
    # DISK_ONLY (r14, VERDICT r13 #2): the fingerprint pool is the one
    # frame here that grows with the CORPUS (every other checkpoint is
    # mix-capped). The default MEMORY_AND_DESER checkpoint pinned it
    # on-heap — at 30x that is most of an 8 GB driver-side heap and
    # the measured source of the "needs a 24 GB driver" wall; spilled
    # to disk the capstone runs at default heap (SCALE.md receipts).
    # The contamination join itself never broadcasts a corpus-growing
    # side: both fp-join inputs shuffle (SortMergeJoin, plan-pinned in
    # EXPLAIN.md) and AQE's broadcast conversions gate on ACTUAL
    # runtime sizes, so only the mix-capped ids side ever builds a
    # hash relation.
    rare = (
        _winnow_fingerprints(docs)
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("__n") <= _FP_CAP)
        .select("doc_id", "fp")
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    left = rare.join(tmix.select("doc_id"), "doc_id")
    right = rare.join(
        splits.where(F.col("split") == "heldout").select("doc_id"),
        "doc_id",
    ).select(F.col("doc_id").alias("__hid"), "fp")
    contaminated = (
        left.join(right, "fp")
        .groupBy("doc_id", "__hid")
        .agg(F.count(F.lit(1)).alias("__n_shared"))
        .filter(F.col("__n_shared") >= _FP_MIN_SHARED)
        .select("doc_id")
        .distinct()
    )
    released = tmix.join(contaminated, "doc_id", "left_anti")
    # 5. shuffled packing within the release
    h = md5_long(
        F.concat(F.lit(_GSHUF_SALT), F.col("doc_id").cast("string"))
    )
    hashed = released.join(
        docs.select(
            "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
        ),
        "doc_id",
    ).select(
        "doc_id",
        "lang",
        "quality_score",
        "log_weight",
        "n_tokens",
        h.alias("h"),
        (h % _GSHUF_SHARDS).alias("shard_id"),
    )
    ranked = hashed.where(F.col("n_tokens") > 0).withColumn(
        "pos",
        F.row_number()
        .over(Window.partitionBy("shard_id").orderBy("h", "doc_id"))
        .cast("long"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return ranked.select(
        "doc_id",
        "lang",
        "quality_score",
        "log_weight",
        "n_tokens",
        "shard_id",
        "pos",
        cum.alias("__cum"),
    ).select(
        "doc_id",
        "lang",
        "quality_score",
        "log_weight",
        "n_tokens",
        "shard_id",
        "pos",
        F.expr(f"__cum div {_PACK_LEN}").alias("seq_id"),
        (F.col("__cum") % _PACK_LEN).alias("seq_offset"),
    )
