"""Sinks (S6/S7 + the Iceberg-style graph materialize).

Export schemas pinned to the app's exports (D14):
  * JSON: {text, predictions:[{token,tag}], entities:[...], timestamp,
    processing_time, dataset}  (app.py:910-917)
  * CSV:  position, token, tag, type                        (app.py:932-939)

Graph materialize (north rule): `entities` and `relations` tables written
partitioned by an entity-type bucket.  In an Iceberg catalog this is
``PARTITIONED BY (bucket(16, entity_type))``; this sandbox has no catalog,
so the writer abstracts the sink: sink='iceberg' issues writeTo().using(
'iceberg'), sink='parquet' (default here) emulates the bucket layout with
partitionBy on a computed bucket column — same data placement semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lexicon import entity_name_case_sql

N_TYPE_BUCKETS = 16


def export_json(preds: DataFrame, mentions_df: DataFrame, path: str,
                dataset: str = "JNLPBA") -> None:
    """Per-doc JSON records with the app's export field set."""
    p = preds.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "token", "tag")))
        .alias("_p")
    ).select(
        "doc_id",
        F.expr(
            "transform(_p, x -> named_struct('token', x.token, 'tag', x.tag))"
        ).alias("predictions"),
    )
    m = mentions_df.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(
                F.col("start_position").alias("sp"),
                F.struct(
                    "text", "type", "tag", "individual_tags", "tokens",
                    "start_position", "end_position",
                ).alias("e"),
            ))
        ).alias("_m")
    ).select("doc_id", F.expr("transform(_m, x -> x.e)").alias("entities"))
    out = (
        p.join(m, "doc_id", "left")
        .withColumn("dataset", F.lit(dataset))
        .withColumn("timestamp", F.lit("1970-01-01T00:00:00"))
    )
    out.write.mode("overwrite").json(path)


def export_csv(preds: DataFrame, path: str) -> None:
    """Per-token CSV rows: position, token, tag, type (app.py:932-939;
    type is derived from the tag column — no mention frame needed)."""
    rows = preds.select(
        "doc_id",
        F.col("pos").alias("position"),
        "token", "tag",
        F.expr(entity_name_case_sql("substr(tag, 3)")).alias("type"),
    )
    rows.write.mode("overwrite").option("header", True).csv(path)


def write_graph_tables(entities: DataFrame, relations: DataFrame,
                       base_path: str, sink: str = "parquet",
                       n_buckets: int = N_TYPE_BUCKETS) -> None:
    """Materialize the KG: entities/relations bucket-partitioned by
    entity-type (north rule 'entities, relations tables partitioned by
    entity-type bucket')."""
    if sink == "iceberg":
        entities.writeTo(f"{base_path}.entities").using("iceberg") \
            .partitionedBy(F.bucket(n_buckets, F.col("entity_type"))) \
            .createOrReplace()
        relations.writeTo(f"{base_path}.relations").using("iceberg") \
            .partitionedBy(F.bucket(n_buckets, F.col("subj_type"))) \
            .createOrReplace()
        return
    e = entities.withColumn(
        "type_bucket", F.pmod(F.xxhash64("entity_type"), F.lit(n_buckets))
    )
    r = relations.withColumn(
        "type_bucket", F.pmod(F.xxhash64("subj_type"), F.lit(n_buckets))
    )
    e.write.mode("overwrite").partitionBy("type_bucket").parquet(
        f"{base_path}/entities"
    )
    r.write.mode("overwrite").partitionBy("type_bucket").parquet(
        f"{base_path}/relations"
    )
