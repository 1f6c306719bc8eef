"""Event-time windowed aggregation with watermark (SURVEY.md §2.8 /
training-pipeline streaming surface).

One logical operator, two execution modes sharing the same expression:

* batch twin `windowed_event_counts(events)` — tumbling 1-hour windows over
  the event timestamp, value-checked against a DuckDB date_trunc oracle
  (query `event_windows`);
* `stream_windowed_event_counts(...)` — the Structured Streaming form:
  `withWatermark(ts, delay)` bounds state for late data, append-mode emits
  a window only once the watermark passes its end (so an availableNow run
  deliberately withholds the trailing windows — asserted in
  tests/test_sinks_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = "1 hour"
WATERMARK = "10 minutes"


def _agg(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", WINDOW), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .alias("value_cents"),
        )
        .select(
            F.col("window.start").cast("string").alias("window_start"),
            "event_type", "n", "value_cents",
        )
    )


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Batch twin: tumbling 1-hour event-time windows per event_type."""
    return _agg(events)


def stream_windowed_event_counts(spark: SparkSession, input_dir: str,
                                 checkpoint_dir: str, out_dir: str,
                                 schema: str, watermark: str = WATERMARK,
                                 trigger_once: bool = True):
    """Streaming form: watermarked state, append-mode parquet sink."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    out = _agg(src.withWatermark("ts", watermark))
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
