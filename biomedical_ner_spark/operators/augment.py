"""Data augmentation (SURVEY.md M4/A13): per-sentence synonym replacement
of O-tagged words + class balancing — the distributed twin of
`augment_sentence` (utils/fonctionsFaxtText.py:615-670) and
`balance_ner_dataset` (utils/fonctionsFaxtText.py:675-824).

Determinism: the reference seeds one global RNG (seed=42, :684-685);
distributed execution can't share a sequential RNG, so each sentence gets
its own seed = xxhash64(doc_id, sent_key, copy_idx) (SURVEY.md §4.3.4) —
retry-safe and order-independent.  The synonym table stands in for
FastText most_similar (J6): a broadcast dict of deterministic synonyms.

The deficit loop of balance_ner_dataset is driver-side logic over tiny
aggregates (A9/A13), exactly like the reference; only the per-sentence
transform is distributed.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# plausibility filter P9 (utils/fonctionsFaxtText.py:553-562)
_STOP = {
    "the", "a", "an", "of", "in", "to", "and", "or", "is", "was", "with",
    "for", "on", "at", "by", "from",
}


def is_plausible(word: str) -> bool:
    w = word.lower()
    return (
        len(w) >= 2
        and all(c.isalpha() or c in "-_" for c in w)
        and w not in _STOP
    )


def default_synonyms() -> dict[str, list[str]]:
    """Deterministic stand-in for fasttext.wv.most_similar (J6)."""
    return {
        "stimulate": ["activate", "induce"],
        "binds": ["attaches", "couples"],
        "expression": ["abundance", "levels"],
        "similar": ["comparable", "analogous"],
        "response": ["reaction"],
        "role": ["function"],
        "key": ["central", "critical"],
        "associated": ["linked", "correlated"],
        "produces": ["generates", "yields"],
        "upregulated": ["increased", "elevated"],
    }


def augment_sentence_py(tokens: list[str], labels: list[str], seed: int,
                        synonyms: dict[str, list[str]],
                        replace_prob: float = 0.3) -> tuple[list[str], list[str]]:
    """Single-sentence transform — shared by the Spark stage and the pytest
    oracle.  Only O-tagged, plausible words with a synonym are replaced."""
    rng = random.Random(seed)
    out = list(tokens)
    for i, (tok, lab) in enumerate(zip(tokens, labels)):
        if lab != "O" or not is_plausible(tok):
            continue
        syns = synonyms.get(tok.lower())
        if syns and rng.random() < replace_prob:
            out[i] = syns[rng.randrange(len(syns))]
    return out, list(labels)


def _sent_seed(doc_id: int, copy_idx: int) -> int:
    h = hashlib.md5(f"{doc_id}:{copy_idx}:42".encode()).digest()
    return int.from_bytes(h[:8], "big")


AUG_SCHEMA = (
    "doc_id BIGINT, copy_idx INT, tokens ARRAY<STRING>, labels ARRAY<STRING>"
)


def augment_sentences(sentences: DataFrame, spark: SparkSession,
                      n_copies: int = 1, replace_prob: float = 0.3,
                      synonyms: dict[str, list[str]] | None = None) -> DataFrame:
    """(doc_id, tokens, labels) -> n_copies augmented rows per sentence via
    one mapInPandas crossing with per-row seeded RNGs."""
    import pandas as pd

    syn = synonyms or default_synonyms()
    b_syn = spark.sparkContext.broadcast(syn)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = b_syn.value
        for pdf in batches:
            rows = []
            for doc_id, toks, labs in zip(
                pdf["doc_id"], pdf["tokens"], pdf["labels"]
            ):
                for c in range(n_copies):
                    t2, l2 = augment_sentence_py(
                        list(toks), list(labs), _sent_seed(doc_id, c),
                        s, replace_prob,
                    )
                    rows.append((doc_id, c, t2, l2))
            yield pd.DataFrame(
                rows, columns=["doc_id", "copy_idx", "tokens", "labels"]
            )

    return sentences.select("doc_id", "tokens", "labels").mapInPandas(
        _run, schema=AUG_SCHEMA
    )


def class_counts(sentences: DataFrame) -> DataFrame:
    """A9: entity-class counts (B- spans per class)."""
    return (
        sentences.select(F.explode("labels").alias("label"))
        .where(F.col("label").startswith("B-"))
        .select(F.expr("substr(label, 3)").alias("cls"))
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def balance_dataset(sentences: DataFrame, spark: SparkSession,
                    max_copies: int = 3,
                    replace_prob: float = 0.3) -> DataFrame:
    """A13 + driver loop: compute per-class deficits vs the median class
    count (reference boosts rare classes toward the median,
    utils/fonctionsFaxtText.py:694-768) and augment sentences containing
    deficient classes; returns original ∪ augmented rows."""
    counts = {r.cls: r.n for r in class_counts(sentences).collect()}
    if not counts:
        return sentences.withColumn("copy_idx", F.lit(-1).cast("int"))
    med = sorted(counts.values())[len(counts) // 2]
    deficient = [c for c, n in counts.items() if n < med]
    base = sentences.withColumn("copy_idx", F.lit(-1).cast("int"))
    if not deficient:
        return base
    has_deficient = F.arrays_overlap(
        F.expr("transform(filter(labels, l -> l LIKE 'B-%'),"
               " l -> substr(l, 3))"),
        F.array(*[F.lit(c) for c in deficient]),
    )
    todo = sentences.where(has_deficient)
    aug = augment_sentences(
        todo, spark, n_copies=max_copies, replace_prob=replace_prob
    )
    return base.unionByName(aug.select(base.columns))
