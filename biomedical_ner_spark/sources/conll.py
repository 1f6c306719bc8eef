"""S1: JNLPBA CoNLL TSV scan (utils/fonctions.py:17-59).

Format: one `token\tlabel` per line; blank line = sentence boundary;
`-DOCSTART-` lines skipped; train/devel/test files concatenated (U1).

Distributed formulation: `spark.read.text` preserves no global order, so we
recover it PROVABLY from (file, split offset, in-split position): the sort
key is `_metadata.file_block_start` (the byte offset of the split the line
came from — splits of one large file order by it) then
`monotonically_increasing_id` (monotone within a split, since one split is
read by one task in file order).  Sentence ids are a running sum of
blank-line markers (W2 sessionization) over that order.  For the ~100 TB
case the per-file windows parallelize across files, and files larger than
`spark.sql.files.maxPartitionBytes` stay correct across their splits
(tests force a multi-split read to prove it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """(file, sent_id, tokens ARRAY<STRING>, labels ARRAY<STRING>) — the
    canonical D2 sentence shape (one StructType, no dual-format sniffing)."""
    raw = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.col("_metadata.file_block_start").alias("_blk"),
            F.col("value").alias("line"),
        )
    )
    # provable per-file line order: split byte-offset first (orders the
    # splits of one large file), then monotonically_increasing_id (monotone
    # within a split: one split = one task reading in file order)
    raw = raw.withColumn("_lid", F.monotonically_increasing_id())
    w = Window.partitionBy("file").orderBy("_blk", "_lid")
    lines = raw.withColumn(
        "is_blank", (F.trim("line") == "").cast("int")
    ).withColumn(
        "sent_id",
        F.sum("is_blank").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    toks = (
        lines.where(
            (F.col("is_blank") == 0)
            & ~F.col("line").startswith("-DOCSTART-")
        )
        .withColumn("token", F.get(F.split("line", "\t"), 0))
        # get() (not [1]) so a tab-less line defaults to 'O' instead of
        # throwing INVALID_ARRAY_INDEX under ANSI mode
        .withColumn("label",
                    F.coalesce(F.get(F.split("line", "\t"), 1), F.lit("O")))
    )
    return (
        toks.groupBy("file", "sent_id")
        .agg(
            F.sort_array(F.collect_list(
                F.struct("_blk", "_lid", "token", "label")))
            .alias("e")
        )
        .select(
            "file", "sent_id",
            F.expr("transform(e, x -> x.token)").alias("tokens"),
            F.expr("transform(e, x -> x.label)").alias("labels"),
        )
    )


def conll_classes(sentences: DataFrame) -> DataFrame:
    """Distinct label universe (classes.txt twin)."""
    return (
        sentences.select(F.explode("labels").alias("label"))
        .distinct()
        .orderBy("label")
    )
