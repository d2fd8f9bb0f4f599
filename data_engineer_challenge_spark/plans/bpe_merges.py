"""Frozen BPE merge table (30 merges).

Trained once with the deterministic ``operators.bpe.train_bpe``
(count-desc, pair-lexicographic tie-break) on the sf0.01 documents
word frequencies, then frozen as literals — the offline-trained-
constant posture of plans/ivf_centroids.py, for the same two reasons
(100 TB: tokenizers train offline on a sample; reproducibility: every
engine and rerun segments identically). 30 merges keeps most of this
small synthetic vocabulary MULTI-token (23/31 words), so the subword
statistics stay non-degenerate; a production table would carry tens
of thousands.

Regenerate (only if the driver testdata changes):

    from data_engineer_challenge_spark.operators.bpe import (
        corpus_word_freqs, train_bpe,
    )
    docs = spark.read.parquet(".../sf0.01/documents.parquet")
    train_bpe(corpus_word_freqs(docs), 30)

(pinned by tests/test_functions.py::
test_bpe_merges_provenance_from_distributed_freqs — the frozen table
is exactly what the engine's own distributed frequency pass + the
deterministic trainer produce.)
"""

from __future__ import annotations

MERGES: list[tuple[str, str]] = [
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('p', 'a'),
    ('pa', 'r'),
    ('o', 'in'),
    ('j', 'oin'),
    ('s', 'h'),
    ('h', 'a'),
    ('ha', 'sh'),
    ('r', 'ow'),
    ('c', 'h'),
    ('b', 'at'),
    ('bat', 'ch'),
    ('s', 'c'),
    ('sc', 'a'),
    ('sca', 'n'),
    ('u', 'st'),
    ('ust', 'o'),
    ('usto', 'mer'),
    ('o', 'lu'),
    ('olu', 'm'),
    ('olum', 'n'),
    ('c', 'ustomer'),
    ('c', 'olumn'),
]
