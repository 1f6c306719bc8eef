"""Probe which stage anti-scales 8->32: mentions (window+agg) vs triples
(self-join) vs pure narrow scan, with matched partitioning."""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run(cpus: int, parts: int, shuffle: int) -> dict:
    from pyspark.sql import functions as F

    from biomedical_ner_spark.operators import spans
    from biomedical_ner_spark.operators.triples import triples as make_triples
    from biomedical_ner_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = docs
    for i in range(1, 16):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
    big = big.repartition(parts).persist()
    big.count()
    out = {"cpus": cpus, "parts": parts, "shuffle": shuffle}

    t = time.time()
    big.selectExpr("sum(size(tokens)) s").collect() if False else None
    d = spans.doc_tags(big)
    d.selectExpr("sum(size(tags))").collect()
    out["narrow_tags"] = round(time.time() - t, 2)

    t = time.time()
    m = spans.mentions(big)
    out["n_mentions"] = m.count()
    out["mentions"] = round(time.time() - t, 2)

    t = time.time()
    mm = spans.mentions(big).persist()
    mm.count()
    out["mentions_persist"] = round(time.time() - t, 2)
    toks = spans.doc_tags(big).select("doc_id", "tokens")
    t = time.time()
    out["n_triples"] = make_triples(toks.withColumnRenamed("tokens", "tokens"), mm).count()
    out["triples"] = round(time.time() - t, 2)
    spark.stop()
    return out


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        cpus, parts, shuffle = map(int, sys.argv[i + 1:i + 4])
        print("RESULT " + json.dumps(run(cpus, parts, shuffle)))
    else:
        for cpus, parts, shuffle in ((8, 64, 64), (32, 64, 64), (32, 256, 64)):
            r = subprocess.run(
                [sys.executable, __file__, "--one", str(cpus), str(parts),
                 str(shuffle)],
                capture_output=True, text=True, cwd="/root/repo",
                env={**os.environ, "SPARK_DRIVER_MEM": "24g"},
            )
            lines = [x for x in r.stdout.splitlines() if x.startswith("RESULT ")]
            print(lines[-1] if lines else r.stderr[-1500:])
