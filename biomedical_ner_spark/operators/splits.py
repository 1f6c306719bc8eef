"""Dataset splits (SURVEY.md O3/O4) — deterministic distributed twins of the
reference's list-slicing splits.

O3 sequential 70/15/15 (JNLPBA.ipynb cc[2]): global position in a stable
order (doc_id), threshold filters — NOT randomSplit (nondeterministic under
retries).

O4 seeded-shuffle split (utils/fonctionsFaxtText.py:829-840,
random.seed(42)+shuffle): order by md5(doc_id || ':' || seed) — a
deterministic permutation identical in Spark and DuckDB, unlike rand(seed)
which is per-partition nondeterministic under retries (SURVEY.md §4.3.4).

Scale note: global rank is computed with the two-pass bucket-offset pattern —
a DETERMINISTIC monotone bucket function of the order key (so bucket i holds
strictly smaller keys than bucket i+1), a per-bucket count aggregate (one row
per bucket collected to the driver, bounded by shuffle partitions), then a
per-bucket row_number plus the broadcast cumulative offset. Equivalent to
``row_number() OVER (ORDER BY key)`` but the corpus never funnels through a
single task, and the 70/15/15 total falls out of the same per-bucket counts
(no separate count() pass). Because the bucket function is a pure expression
(not sampled like repartitionByRange), no persist is needed between the two
passes: recomputation reproduces identical bucket assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucketed_rank(df: DataFrame, bucket: Column,
                   order_cols: list) -> "tuple[DataFrame, int]":
    """Attach a global 1-based ``_rn`` in ``order_cols`` order, distributed.

    ``bucket`` must be monotone non-decreasing in the order key. Returns
    (ranked_df, total_rows).
    """
    with_bucket = df.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["n"]
        for r in with_bucket.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    if not counts:
        return with_bucket.withColumn("_rn", F.lit(0)).drop("_bkt"), 0
    # Cumulative offsets travel back as a broadcast-joined dim, not a
    # create_map literal: the dim is bucket-count-bounded (metadata-scale,
    # like range-partition boundaries), and a join keeps the plan size flat
    # when callers use fine-grained buckets (vocab_build's freq x first-char
    # buckets can reach 10^5+ at web scale; a 10^5-entry map literal would
    # not compile).
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = df.sparkSession.createDataFrame(
        offsets, schema=["_bkt", "_off"])
    w = Window.partitionBy("_bkt").orderBy(*order_cols)
    ranked = (
        with_bucket.join(F.broadcast(off_df), "_bkt")
        .withColumn("_rn", F.row_number().over(w) + F.col("_off"))
        .drop("_bkt", "_off")
    )
    return ranked, total


def _threshold_select(ranked: DataFrame, total: int, train: float,
                      dev: float) -> DataFrame:
    # int() truncation, matching the reference's Python slicing and the
    # DuckDB oracle's CAST(floor(total*f) AS BIGINT)
    n_train = int(total * train)
    n_dev = int(total * dev)
    return ranked.select(
        "doc_id",
        F.when(F.col("_rn") <= n_train, "train")
        .when(F.col("_rn") <= n_train + n_dev, "dev")
        .otherwise("test")
        .alias("split"),
    )


def _n_buckets(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def sequential_split(docs: DataFrame, train: float = 0.7,
                     dev: float = 0.15) -> DataFrame:
    """(doc_id, split) by position in doc_id order.

    Bucket = uniform slice of the observed [min, max] doc_id range (one tiny
    agg) — monotone in doc_id, deterministic. Clustered ids skew bucket
    SIZES, never rank correctness.
    """
    base = docs.select("doc_id")
    nb = _n_buckets(base)
    lo, hi = base.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:  # empty corpus
        return base.select("doc_id", F.lit("train").alias("split")).limit(0)
    # bucket arithmetic in DOUBLE: with 64-bit hash-derived ids (the
    # pipeline's own xxhash64 doc_id) lo..hi spans ~1.8e19, which neither
    # fits a long literal nor survives (doc_id - lo) * nb under ANSI
    # overflow checking.  Division by a positive double constant is
    # monotone non-decreasing, so the bucket stays a valid monotone
    # function of doc_id; precision only blurs bucket BOUNDARIES (sizes),
    # never the rank correctness (ties stay within one bucket's window).
    span = max(float(int(hi) - int(lo)) + 1.0, 1.0)
    bucket = F.least(
        F.lit(nb - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col("doc_id").cast("double") - F.lit(float(int(lo))))
            / F.lit(span) * nb
        ).cast("int")),
    )
    ranked, total = _bucketed_rank(base, bucket, [F.col("doc_id")])
    return _threshold_select(ranked, total, train, dev)


def seeded_shuffle_split(docs: DataFrame, seed: int = 42, train: float = 0.7,
                         dev: float = 0.15) -> DataFrame:
    """(doc_id, split) by position in the md5-permuted order.

    Bucket = top 16 bits of the md5 key (uniform by construction), scaled to
    the bucket count — monotone in the hex key because the bucket uses the
    key's leading digits.
    """
    base = docs.select(
        "doc_id",
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                          F.lit(str(seed)))).alias("_key"),
    )
    nb = _n_buckets(base)
    bucket = F.floor(
        F.conv(F.substring("_key", 1, 4), 16, 10).cast("long") * nb / 65536
    ).cast("int")
    ranked, total = _bucketed_rank(
        base, bucket, [F.col("_key").asc(), F.col("doc_id").asc()])
    return _threshold_select(ranked, total, train, dev).select(
        "doc_id", "split")


def split_counts(split_df: DataFrame) -> DataFrame:
    return split_df.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      seed: int = 42,
                      stratum_col: str = "lang") -> DataFrame:
    """Deterministic per-stratum sampling for training-data curation:
    keep a row iff md5(doc_id:seed) scaled to [0, 1) falls under its
    stratum's fraction.  Unlike ``sampleBy``/``rand(seed)`` (per-partition
    state, nondeterministic under task retries — SURVEY.md §4.3.4), the
    keep decision is a pure row function, so retries, resumes, and
    engine replays (the DuckDB oracle) agree row-for-row.  Strata absent
    from ``fractions`` are dropped (fraction 0).  One narrow filter, no
    shuffle; the fractions dim is a plan literal (bounded by stratum
    count)."""
    # F.concat (not concat_ws): a NULL doc_id must propagate to a NULL
    # key so the row is dropped by the comparison — the same semantics as
    # the oracle's `doc_id || ':seed'` (concat_ws would silently skip the
    # NULL and sample every null-id row as one constant-key block)
    key = (
        F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(f":{seed}"))), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    frac = None
    for s, f in sorted(fractions.items()):
        frac = (F.when(F.col(stratum_col) == s, F.lit(float(f)))
                if frac is None
                else frac.when(F.col(stratum_col) == s, F.lit(float(f))))
    frac = (frac.otherwise(F.lit(0.0)) if frac is not None
            else F.lit(0.0))
    return docs.where(key < frac)
