"""Same-session A/B of ngram_jaccard formulations (r06, guide §1).

Host phases drift 1.5-2x between runs, so the candidate physical
forms are timed ROUND-ROBIN inside one session:

  old       — r5 shape: inverted-index self-join for common + separate
              sizes aggregate joined twice (lineage evaluated 4x).
  group     — one groupBy(shingle) + in-group combination expand carrying
              sizes in the posting struct (lineage 1x, ONE exchange, but
              the k^2/2 pair structs come out of interpreted HOF lambdas).
  join_sz   — self-join on shingle with sizes carried ARRAY-SIDE on each
              side (lineage 2x, two exchanges, pair stream fully codegen,
              no sizes joins).
  join_ratio — join_sz + the exact size-ratio prefilter (SHIPPED form).
  join_ratio_shj — join_ratio with a SHUFFLE_HASH hint (measured worse;
              kept for reproducibility).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_ngram.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from biomedical_ner_spark.operators import dedup  # noqa: E402
from biomedical_ner_spark.session import get_spark  # noqa: E402

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def old_form(docs, threshold=0.2, n=3):
    sh = dedup._shingles(docs, "text", n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    common = (a.join(b, "shingle").where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common")))
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (common.join(sa, "a").join(sb, "b")
            .withColumn("jaccard", F.round(
                F.col("common") /
                (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def group_form(docs, threshold=0.2, n=3):
    """The rejected groupBy(shingle) + in-group expand (inlined so the
    A/B stays reproducible now that dedup ships the join_ratio form)."""
    sh = _sized_side(docs, n)
    posting = F.sort_array(F.collect_list(F.struct("doc_id", "sz")))
    pe = ("flatten(transform(ds, (x, i) ->"
          " transform(slice(ds, i + 2, size(ds) - i - 1),"
          " y -> struct(x.doc_id AS a, y.doc_id AS b,"
          " x.sz AS sz_a, y.sz AS sz_b))))")
    common = (sh.groupBy("shingle").agg(posting.alias("ds"))
              .where(F.size("ds") > 1)
              .select(F.explode(F.expr(pe)).alias("p"))
              .groupBy("p.a", "p.b", "p.sz_a", "p.sz_b")
              .agg(F.count(F.lit(1)).alias("common")))
    return (common.withColumn("jaccard", F.round(
                F.col("common") /
                (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def _sized_side(docs, n):
    return dedup._shingle_arrays(docs, "text", n).select(
        "doc_id", F.size("shs").alias("sz"),
        F.explode(F.expr("transform(shs, s -> s)")).alias("shingle"))


def join_sz_form(docs, threshold=0.2, n=3):
    sh = _sized_side(docs, n)
    a = sh.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"),
                  "shingle")
    b = sh.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"),
                  "shingle")
    common = (a.join(b, "shingle").where(F.col("a") < F.col("b"))
              .groupBy("a", "b", "sz_a", "sz_b")
              .agg(F.count(F.lit(1)).alias("common")))
    return (common.withColumn("jaccard", F.round(
                F.col("common") /
                (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def join_ratio_form(docs, threshold=0.2, n=3):
    """join_sz + EXACT size-ratio prefilter: jaccard(A,B) <= min/max of
    the set sizes, so pairs with min(sz) < t*max(sz) can never reach the
    threshold — dropping their instances BEFORE the aggregation changes
    nothing in the output set."""
    sh = _sized_side(docs, n)
    a = sh.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"),
                  "shingle")
    b = sh.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"),
                  "shingle")
    common = (a.join(b, "shingle")
              .where((F.col("a") < F.col("b"))
                     & (F.least("sz_a", "sz_b")
                        >= F.greatest("sz_a", "sz_b") * F.lit(threshold)))
              .groupBy("a", "b", "sz_a", "sz_b")
              .agg(F.count(F.lit(1)).alias("common")))
    return (common.withColumn("jaccard", F.round(
                F.col("common") /
                (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def join_ratio_shj_form(docs, threshold=0.2, n=3):
    """join_ratio with a SHUFFLE_HASH hint: per-partition build side is
    ~20k rows at sf1.0/128 partitions, so the hash build is cheap and both
    sort passes of the sort-merge join disappear."""
    sh = _sized_side(docs, n)
    a = sh.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"),
                  "shingle")
    b = sh.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"),
                  "shingle")
    common = (a.join(b.hint("SHUFFLE_HASH"), "shingle")
              .where((F.col("a") < F.col("b"))
                     & (F.least("sz_a", "sz_b")
                        >= F.greatest("sz_a", "sz_b") * F.lit(threshold)))
              .groupBy("a", "b", "sz_a", "sz_b")
              .agg(F.count(F.lit(1)).alias("common")))
    return (common.withColumn("jaccard", F.round(
                F.col("common") /
                (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def main():
    spark = get_spark(app_name="ab-ngram", master=f"local[{bench.CPUS}]",
                      shuffle_partitions=max(4 * bench.CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sf = bench._prep_input(spark)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    forms = [("old", old_form), ("group", group_form),
             ("join_sz", join_sz_form), ("join_ratio", join_ratio_form),
             ("join_ratio_shj", join_ratio_shj_form)]
    # warm codegen once per form
    for name, fn in forms:
        fn(docs.limit(500)).count()
    results = {name: [] for name, _ in forms}
    counts = {}
    for r in range(ROUNDS):
        b0 = bench._burn()
        for name, fn in forms:
            spark.sparkContext.setJobDescription(f"ngram:{name}:r{r}")
            t0 = time.time()
            counts[name] = fn(docs).count()
            results[name].append(round(time.time() - t0, 2))
        print(f"round {r}: burn={b0:.2f} " + " ".join(
            f"{n}={results[n][-1]}s" for n, _ in forms), flush=True)
    print("counts:", counts)
    print("best:", {n: min(v) for n, v in results.items()})
    print("median:", {n: sorted(v)[len(v) // 2] for n, v in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
