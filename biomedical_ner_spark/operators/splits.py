"""Dataset splits (SURVEY.md O3/O4) — deterministic distributed twins of the
reference's list-slicing splits.

O3 sequential 70/15/15 (JNLPBA.ipynb cc[2]): row_number over a stable order
(doc_id), threshold filters — NOT randomSplit (nondeterministic under
retries).

O4 seeded-shuffle split (utils/fonctionsFaxtText.py:829-840,
random.seed(42)+shuffle): order by md5(doc_id || ':' || seed) — a
deterministic permutation identical in Spark and DuckDB, unlike rand(seed)
which is per-partition nondeterministic under retries (SURVEY.md §4.3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sequential_split(docs: DataFrame, train: float = 0.7,
                     dev: float = 0.15) -> DataFrame:
    """(doc_id, split) by position in doc_id order."""
    n = docs.count()
    n_train = int(n * train)
    n_dev = int(n * dev)
    w = Window.orderBy("doc_id")
    return (
        docs.select("doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id",
            F.when(F.col("_rn") <= n_train, "train")
            .when(F.col("_rn") <= n_train + n_dev, "dev")
            .otherwise("test")
            .alias("split"),
        )
    )


def seeded_shuffle_split(docs: DataFrame, seed: int = 42, train: float = 0.7,
                         dev: float = 0.15) -> DataFrame:
    """(doc_id, split) by position in the md5-permuted order."""
    n = docs.count()
    n_train = int(n * train)
    n_dev = int(n * dev)
    key = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                            F.lit(str(seed))))
    w = Window.orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id",
            F.when(F.col("_rn") <= n_train, "train")
            .when(F.col("_rn") <= n_train + n_dev, "dev")
            .otherwise("test")
            .alias("split"),
        )
    )


def split_counts(split_df: DataFrame) -> DataFrame:
    return split_df.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
