"""Round-6 optimization harness (guide §1): per-query isolation timings +
plan capture.  bench.py is FROZEN for the driver's measurement; this file
holds the extra instrumentation the optimization round needs:

  * same input layout + session as bench.py (imports its _prep_input);
  * times each query with best-of-N ``.count()`` (the driver metric) and,
    with --noop, a noop-sink materialization of every column (guide §1.4);
  * captures ``.explain("formatted")`` into plans/r06/<name>_<tag>.txt;
  * labels jobs via setJobDescription (guide §1.5);
  * embeds the same burn calibration as bench.py so walls are comparable
    across host phases.

Usage:
  python bench_extra.py --tag before [--noop] [--plans] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen driver bench: reuses layout + burn)
from biomedical_ner_spark import queries as Q  # noqa: E402
from biomedical_ner_spark.operators import spans  # noqa: E402
from biomedical_ner_spark.operators.linking import link_mentions  # noqa: E402
from biomedical_ner_spark.operators.triples import triples as make_triples  # noqa: E402
from biomedical_ner_spark.session import get_spark  # noqa: E402

REGISTRY_NAMES = [
    "entity_type_counts", "corpus_stats", "vocab_build",
    "minhash_lsh_pairs", "simhash", "ann_topk", "quality_score",
    "lsh_topk", "ivf_topk", "event_windows", "corpus_curation",
    "dedup_exact", "ngram_jaccard", "embedding_near_dups",
    "subword_vectors", "encoded_tokens",
]

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plan file suffix")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink materialization")
    ap.add_argument("--plans", action="store_true",
                    help="write explain('formatted') to plans/r06/")
    ap.add_argument("--trials", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_TRIALS", "2")))
    ap.add_argument("names", nargs="*", default=[])
    args = ap.parse_args()
    names = args.names or (["mentions", "mentions_arrow", "link", "triples"]
                           + REGISTRY_NAMES)

    burn_before = bench._burn()
    cpus = bench.CPUS
    spark = get_spark(app_name="bioner-bench-extra",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(4 * cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sf = bench._prep_input(spark)

    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .repartition(max(4 * cpus, 32)).persist())
    n_docs = docs.count()
    # same warm-up as bench.py
    spans.mentions(docs.limit(200)).count()

    mentions_df = None

    def build(name):
        nonlocal mentions_df
        if name == "mentions":
            return spans.mentions(docs)
        if name == "mentions_arrow":
            da = docs.repartition(max(1, min(n_docs // 150, 4 * cpus)))
            return spans.extract_mentions_arrow(
                da, text_col="text", id_col="doc_id")
        if name in ("link", "triples") and mentions_df is None:
            mentions_df = spans.mentions(docs).persist()
            mentions_df.count()
        if name == "link":
            return link_mentions(mentions_df, spark)
        if name == "triples":
            toks = spans.doc_tokens(docs).select("doc_id", "tokens")
            return make_triples(toks, mentions_df)
        return Q.queries()[name](spark, sf)

    out: dict = {"sf": bench.SF_DIR, "cpus": cpus, "tag": args.tag,
                 "queries": {}, "counts": {}, "noop": {}}
    for name in names:
        if args.plans and args.tag:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = build(name)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                .fromString("formatted")
            with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(df._jdf.queryExecution().explainString(mode))
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:count")
        t, n = bench.timed(lambda: build(name).count(), args.trials)
        out["queries"][name] = round(t, 3)
        out["counts"][name] = n
        if args.noop:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:noop")
            t2, _ = bench.timed(
                lambda: build(name).write.format("noop")
                .mode("overwrite").save() or 0, args.trials)
            out["noop"][name] = round(t2, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: count={out['queries'][name]}s"
              + (f" noop={out['noop'][name]}s" if args.noop else ""),
              file=sys.stderr)
    out["total_sec"] = round(sum(out["queries"].values()), 3)
    out["burn_1proc_sec_before"] = round(burn_before, 2)
    out["burn_1proc_sec_after"] = round(bench._burn(), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
