"""Run manifest: per-partition lineage + counters for resumable runs
(north rule; SURVEY.md §4.3.5).

Schema: (run_id, stage, bucket, rows_in, rows_out, sha_ok, ts).
A bucket is *done* for a stage iff a manifest row exists; restart
anti-joins pending = all-buckets minus done (J10) and reprocesses only
those, with bucket-level dynamic-partition-overwrite making the data
writes idempotent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "run_id STRING, stage STRING, bucket INT, rows_in BIGINT,"
    " rows_out BIGINT, sha_ok BOOLEAN, ts DOUBLE"
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def done_buckets(spark: SparkSession, path: str, run_id: str,
                 stage: str) -> set[int]:
    m = read_manifest(spark, path)
    rows = (
        m.where((F.col("run_id") == run_id) & (F.col("stage") == stage))
        .select("bucket").distinct().collect()
    )
    return {r.bucket for r in rows}


def append_rows(spark: SparkSession, path: str, rows: list[tuple]) -> None:
    if rows:
        spark.createDataFrame(rows, MANIFEST_SCHEMA).write.mode("append") \
            .parquet(path)


def stage_counters(run_id: str, stage: str, in_counts: dict[int, int],
                   out_counts: dict[int, int],
                   sha_ok: dict[int, bool]) -> list[tuple]:
    now = time.time()
    buckets = set(in_counts) | set(out_counts)
    return [
        (
            run_id, stage, int(b),
            int(in_counts.get(b, 0)), int(out_counts.get(b, 0)),
            bool(sha_ok.get(b, True)), now,
        )
        for b in sorted(buckets)
    ]
