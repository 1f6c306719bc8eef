"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the KG pipeline stages (mentions -> linked -> canonical ->
triples; the north-rule throughput path) plus the flagship aggregates and
the scale-path dedup/similarity operators.

The primary metric is triples/sec (BASELINE.json), reported alongside
per-query wall seconds.  The driver testdata is ONE parquet file with ONE
row group per table — an unsplittable scan, so every query's first stage
(scan + map-side partial agg, where dedup does all its hashing) would run
on a single task.  A real 100 TB table is thousands of files/row groups
and scans wide, so the bench materializes the input once (untimed) as a
many-file copy in /dev/shm and times the queries against that layout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from biomedical_ner_spark import queries as Q  # noqa: E402
from biomedical_ner_spark.operators import spans  # noqa: E402
from biomedical_ner_spark.operators.linking import link_mentions  # noqa: E402
from biomedical_ner_spark.operators.triples import triples as make_triples  # noqa: E402
from biomedical_ner_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))


def _burn() -> float:
    """Fixed CPU burn (30M int mults) — THE canonical calibration loop;
    scripts/scaling_bench.py imports it so BENCH and BENCH_SCALING
    artifacts divide by identical reference work.  The sandbox host's
    clock drifts >2x between minutes, so every BENCH artifact carries its
    own before/after calibration."""
    t0 = time.time()
    x = 0
    for i in range(30_000_000):
        x += i * i
    return time.time() - t0


def _burn_parallel(procs: int = CPUS) -> float:
    """Parallel-phase calibration: efficiency of `procs` concurrent copies
    of the canonical burn (1.0 = the host grants full parallelism).  The
    1-proc burn alone does NOT capture host health here — a round-5 bench
    measured 42.7 s vs the 19.81 s record at EQUAL 1-proc burns while
    this probe read 0.56-0.67.  Embedded in the artifact so per-run walls
    can be judged against the host's actual parallel capacity."""
    import multiprocessing as mp

    b1 = _burn()
    with mp.Pool(procs) as pool:
        t0 = time.time()
        pool.map(_burn_child, range(procs))
        wall = time.time() - t0
    return b1 / wall


def _burn_child(_i: int) -> float:
    return _burn()


def timed(fn, trials: int = TRIALS):
    """Best-of-N wall (the sandbox host's clock speed drifts >2x between
    minutes; min over trials is the least-noisy point estimate)."""
    best, n = None, None
    for _ in range(trials):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, n


def _prep_input(spark) -> str:
    """Untimed: copy each table to a many-file layout (2x cores) so scans
    parallelize the way a multi-file production table would."""
    import shutil

    dst = "/dev/shm/bns_bench_sf" if os.access("/dev/shm", os.W_OK) \
        else "/tmp/bns_bench_sf"
    shutil.rmtree(dst, ignore_errors=True)
    # per-table split counts: documents carry CPU-heavy per-row expression
    # work (wide scans win at 2x cores regardless of file size); embeddings
    # feed Arrow/numpy batch stages where a ~50 ms-per-task setup makes
    # tiny files read as serial overhead — batches want >= ~250 vectors
    # each; events is a narrow table hit only by a cheap windowed agg, so
    # files below ~25k rows are pure task-scheduling overhead (the r3
    # bench split it 64 ways at 1.5k rows/file and the 1-exchange
    # event_windows query measured 0.91 s vs 0.41 s on the same session —
    # a production events table's files are full row groups, not slivers)
    for t in ("documents", "events", "embeddings"):
        src = f"{SF_DIR}/{t}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        wide = max(2 * CPUS, 32)
        if t == "embeddings":
            files = max(1, min(wide, df.count() // 250))
        elif t == "events":
            files = max(1, min(wide, df.count() // 25_000))
        else:
            files = wide
        (df.repartition(files)
         .write.mode("overwrite").parquet(f"{dst}/{t}.parquet"))
    return dst


def main() -> None:
    # >= 4 partitions/core: undersized partition counts measured severe
    # cache/GC contention at high thread counts (scripts/scale_probe.py)
    burn_before = _burn()
    spark = get_spark(
        app_name="bioner-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(4 * CPUS, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_sf = _prep_input(spark)
    docs = (
        spark.read.parquet(f"{bench_sf}/documents.parquet")
        .repartition(max(4 * CPUS, 32))
        .persist()
    )
    n_docs = docs.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    # warm the JVM/codegen once so steady-state throughput is measured
    spans.mentions(docs.limit(200)).count()

    t, n = timed(lambda: spans.mentions(docs).count())
    timings["mentions"], counts["mentions"] = t, n

    # Arrow stages want fat tasks (>= ~0.5 s of work each; ~50 ms setup
    # per task), NOT the 4x-cores split the JVM window/persist stages
    # want — timing mentions_arrow off the shared 128-partition frame
    # oversplit it to ~39 docs/task and read as a 2x regression in r4
    # (same-session A/B, scripts/ab_mentions_arrow.py: best 1.16 s @128
    # vs 0.50 s @32 partitions at equal burn).  ~150 docs/task.
    docs_arrow = docs.repartition(
        max(1, min(n_docs // 150, 4 * CPUS))).persist()
    docs_arrow.count()
    t, n = timed(lambda: spans.extract_mentions_arrow(
        docs_arrow, text_col="text", id_col="doc_id").count())
    timings["mentions_arrow"], counts["mentions_arrow"] = t, n

    mentions_df = spans.mentions(docs).persist()
    mentions_df.count()

    t, n = timed(lambda: link_mentions(mentions_df, spark).count())
    timings["link"], counts["link"] = t, n

    toks = spans.doc_tokens(docs).select("doc_id", "tokens")
    t, n = timed(lambda: make_triples(toks, mentions_df).count())
    timings["triples"], counts["triples"] = t, n

    # round-1-comparable set first, then the round-2 additions (lsh/ivf
    # ANN paths, event-time windows, composed curation), then round-3
    # (exact dedup, inverted-index jaccard, LSH-blocked embedding
    # near-dups, subword composition, Arrow encode stage)
    for name in (
        "entity_type_counts", "corpus_stats", "vocab_build",
        "minhash_lsh_pairs", "simhash", "ann_topk", "quality_score",
        "lsh_topk", "ivf_topk", "event_windows", "corpus_curation",
        "dedup_exact", "ngram_jaccard", "embedding_near_dups",
        "subword_vectors", "encoded_tokens",
    ):
        fn = Q.queries()[name]
        t, n = timed(lambda f=fn: f(spark, bench_sf).count())
        timings[name], counts[name] = t, n

    total = sum(timings.values())
    triples_per_sec = counts["triples"] / timings["triples"] if timings[
        "triples"] else 0.0
    docs_per_sec = n_docs / timings["mentions"] if timings["mentions"] else 0.0

    out = {
        "metric": "triples/sec",
        "value": round(triples_per_sec, 1),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "counts": counts,
        "docs_per_sec": round(docs_per_sec, 1),
        "n_docs": n_docs,
        "total_sec": round(total, 3),
        "sf": SF_DIR,
        "cpus": CPUS,
        "trials_best_of": TRIALS,
        "input_layout": (
            f"per-table split: documents {max(2 * CPUS, 32)} files,"
            " events >=25k rows/file, embeddings >=250 rows/file;"
            " arrow stage ~150 docs/task"),
        # host-speed calibration bracketing the run: this host's reference
        # for the same burn is ~1.6 s at full speed and >6 s when throttled
        # (BASELINE.md); divide walls by (burn/1.6) to compare across runs
        "burn_1proc_sec_before": round(burn_before, 2),
        "burn_1proc_sec_after": round(_burn(), 2),
        "burn_parallel_eff": round(_burn_parallel(), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
