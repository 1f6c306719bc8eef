"""Stateful streaming dedup (applyInPandasWithState) and salted-aggregation
equality under skew (FIXTURES.md §6)."""

import pytest
from pyspark.sql import functions as F

from biomedical_ner_spark.operators.canonicalize import salted_counts


def test_salted_counts_equal_plain_counts_under_skew(spark):
    # Zipf-ish skew: one key dominates
    rows = [("hot",)] * 5000 + [("warm",)] * 300 + [("cold",)] * 7
    df = spark.createDataFrame(rows, "k STRING").repartition(16)
    plain = {r.k: r.n for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    for n_salt in (4, 16, 64):
        salted = {r.k: r.n for r in salted_counts(df, "k", n_salt).collect()}
        assert salted == plain


def test_streaming_stateful_dedup(spark, tmp_path):
    from biomedical_ner_spark.streaming.dedup_stream import streaming_dedup

    rows = [
        (0, "aa11"), (1, "aa11"), (2, "bb22"), (3, "cc33"), (4, "bb22"),
        (5, "dd44"),
    ]
    src = spark.createDataFrame(rows, "doc_id BIGINT, content_sha STRING")
    in_dir = str(tmp_path / "in")
    src.repartition(2).write.parquet(in_dir)
    stream = (
        spark.readStream.schema("doc_id BIGINT, content_sha STRING")
        .parquet(in_dir)
    )
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 6
    keepers = {r.content_sha for r in got.where("first_seen").collect()}
    assert keepers == {"aa11", "bb22", "cc33", "dd44"}
    # exactly one keeper per sha
    dup_keepers = (
        got.where("first_seen").groupBy("content_sha").count()
        .where("count > 1").count()
    )
    assert dup_keepers == 0
