"""Same-session A/B of every r06-restructured query: r5 formulation vs
shipped r6 formulation, timed round-robin in ONE session so host-phase
drift (1.5-2.5x between minutes on this host) cancels out of the
comparison.  Counts are asserted equal.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/ab_r06.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from biomedical_ner_spark import queries as Q  # noqa: E402
from biomedical_ner_spark.functions.text import (  # noqa: E402
    fingerprint_expr, punct_ratio_expr, stopword_ratio_expr, tokenize_expr,
)
from biomedical_ner_spark.operators import dedup, spans, stats  # noqa: E402
from biomedical_ner_spark.operators.linking import link_mentions  # noqa: E402
from biomedical_ner_spark.session import get_spark  # noqa: E402

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


# ---- r5 formulations, reconstructed ---------------------------------------

def old_entity_type_counts(spark, sf):
    return stats.entity_type_counts(
        spans.mentions(Q._docs(spark, sf)))


def old_corpus_stats(spark, sf):
    return stats.corpus_stats(Q._tags(spark, sf, with_lang=True))


def old_vocab_build(spark, sf):
    return stats.vocab_build(Q._tags(spark, sf)).select(
        "word", "freq", F.col("id").cast("bigint").alias("id"))


def old_simhash(spark, sf):
    d = Q._docs(spark, sf)
    from biomedical_ner_spark.functions.text import SQL_TOKEN_PATTERN
    toks = F.expr(
        f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)")
    t = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.expr(
            "cast(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT)"))
    )
    bit_sums = t.groupBy("doc_id").agg(*[
        F.sum(F.when(F.expr(f"(h >> {b}) & 1") == 1, F.col("cnt"))
              .otherwise(-F.col("cnt"))).alias(f"b{b}")
        for b in range(32)])
    fp = None
    for b in range(32):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select("doc_id", fp.cast("bigint").alias("simhash"))


def old_corpus_curation(spark, sf):
    d = Q._docs(spark, sf)
    toks = tokenize_expr("text")
    q = d.select(
        "doc_id",
        F.sha2("text", 256).alias("sha"),
        fingerprint_expr(F.col("text")).alias("fp"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(punct_ratio_expr(toks), 6).alias("punct_ratio"),
        F.round(stopword_ratio_expr(toks), 6).alias("stopword_ratio"),
    )
    sha_keep = q.groupBy("sha").agg(F.min("doc_id").alias("doc_id"))
    fp_keep = q.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return (
        q.join(sha_keep, ["sha", "doc_id"])
        .join(fp_keep, ["fp", "doc_id"])
        .where((F.col("n_tokens") >= 10) & (F.col("punct_ratio") <= 0.3)
               & (F.col("stopword_ratio") <= 0.6))
        .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
                F.col("fp").alias("fingerprint")))


def old_mentions_fn(docs):
    """r5 spans.mentions: O-filter AFTER the window."""
    keep_cols = ["doc_id"]
    d = spans.doc_tags(docs)
    tok = d.select(
        *keep_cols,
        F.posexplode(F.expr(
            "transform(tokens, (tok, i) -> named_struct("
            "'token', tok, 'tag', tags[i],"
            "'is_start', CASE"
            "  WHEN tags[i] = 'O' THEN 0"
            "  WHEN substr(tags[i], 1, 2) = 'B-' THEN 1"
            "  WHEN i = 0 THEN 1"
            "  WHEN tags[i-1] = 'O' THEN 1"
            "  WHEN substr(tags[i-1], 3) != substr(tags[i], 3) THEN 1"
            "  ELSE 0 END))"
        )).alias("pos", "e"),
    ).select(*keep_cols, "pos", "e.token", "e.tag", "e.is_start")
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    numbered = tok.withColumn("span_id", F.sum("is_start").over(w))
    return (
        numbered.filter((F.col("tag") != "O") & (F.col("span_id") > 0))
        .groupBy("doc_id", "span_id")
        .agg(F.sort_array(F.collect_list(
            F.struct("pos", "token", "tag"))).alias("elems"))
        .select(
            *keep_cols,
            F.expr("concat_ws(' ', transform(elems, e -> e.token))")
            .alias("text"),
            F.expr("substr(elems[0].tag, 3)").alias("type"),
            F.expr("concat('B-', substr(elems[0].tag, 3))").alias("tag"),
            F.expr("transform(elems, e -> e.tag)").alias("individual_tags"),
            F.expr("transform(elems, e -> e.token)").alias("tokens"),
            F.expr("elems[0].pos").alias("start_position"),
            F.expr("elems[size(elems)-1].pos").alias("end_position"),
        ))


def main():
    spark = get_spark(app_name="ab-r06", master=f"local[{bench.CPUS}]",
                      shuffle_partitions=max(4 * bench.CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sf = bench._prep_input(spark)
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    pairs = [
        ("entity_type_counts",
         lambda: old_entity_type_counts(spark, sf),
         lambda: Q.q_entity_type_counts(spark, sf)),
        ("corpus_stats",
         lambda: old_corpus_stats(spark, sf),
         lambda: Q.q_corpus_stats(spark, sf)),
        ("vocab_build",
         lambda: old_vocab_build(spark, sf),
         lambda: Q.q_vocab_build(spark, sf)),
        ("simhash",
         lambda: old_simhash(spark, sf),
         lambda: Q.q_simhash(spark, sf)),
        ("corpus_curation",
         lambda: old_corpus_curation(spark, sf),
         lambda: Q.q_corpus_curation(spark, sf)),
        ("mentions",
         lambda: old_mentions_fn(docs),
         lambda: spans.mentions(docs)),
    ]
    for name, old, new in pairs:  # codegen warm-up
        old().limit(1).count()
        new().limit(1).count()
    res = {n: {"old": [], "new": []} for n, _, _ in pairs}
    counts = {}
    for r in range(ROUNDS):
        b0 = bench._burn()
        line = [f"round {r} burn={b0:.2f}"]
        for name, old, new in pairs:
            for tag, fn in (("old", old), ("new", new)):
                spark.sparkContext.setJobDescription(f"{name}:{tag}:r{r}")
                t0 = time.time()
                c = fn().count()
                res[name][tag].append(round(time.time() - t0, 3))
                counts.setdefault(name, {})[tag] = c
            line.append(f"{name} {res[name]['old'][-1]}/{res[name]['new'][-1]}")
        print("  ".join(line), flush=True)
    bad = {n: c for n, c in counts.items() if c["old"] != c["new"]}
    print("count mismatches:", bad or "none")
    for n in res:
        o, w = min(res[n]["old"]), min(res[n]["new"])
        print(f"{n:22s} old_best={o:7.3f} new_best={w:7.3f} ratio={w/o:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
