"""Same-session A/B for the bucketed-write sharding knob (round-5 verdict
directive #1): run the full KG pipeline over the SAME synthesized corpus
with files_per_bucket=1 (one file per bucket — the r4 configuration) and
with a sharded setting, alternating runs, reporting stage walls + output
counts + burn calibration.

The graph stage's 38.9M-row relations exchange + write was ~55% of the 1M
run's wall in r4; this measures whether write parallelism past n_buckets
cuts it on this box or the write is bandwidth-bound here.

Usage: python scripts/ab_write_sharding.py N_FILES [--buckets 32]
       [--fpb 4] [--rounds 2] [--cpus 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _burn  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_files", type=int)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--fpb", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--workdir", default="/dev/shm/bns_ab_shard")
    args = ap.parse_args()

    from biomedical_ner_spark.plans.kg_pipeline import run_kg_pipeline
    from biomedical_ner_spark.session import get_spark
    from biomedical_ner_spark.sources.repos import synthesize_repos_sql

    spark = get_spark(app_name="bns-ab-shard",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(4 * args.cpus, 64))
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.workdir, ignore_errors=True)
    try:
        in_path = f"{args.workdir}/repos.parquet"
        (synthesize_repos_sql(spark, args.n_files, seed=args.seed)
         .repartition(max(2 * args.cpus, 32))
         .write.mode("overwrite").parquet(in_path))
        repos = spark.read.parquet(in_path)

        # warm both configurations' codegen + python workers
        warm = synthesize_repos_sql(spark, 2000, seed=args.seed + 1)
        for fpb in (1, args.fpb):
            run_kg_pipeline(spark, warm, f"{args.workdir}/warm{fpb}",
                            n_buckets=args.buckets, resume=False,
                            files_per_bucket=fpb)

        results: dict[str, list] = {"fpb1": [], f"fpb{args.fpb}": []}
        burns = [round(_burn(), 2)]
        counts = {}
        for _ in range(args.rounds):
            for key, fpb in (("fpb1", 1), (f"fpb{args.fpb}", args.fpb)):
                out = f"{args.workdir}/out_{key}"
                shutil.rmtree(out, ignore_errors=True)
                t0 = time.time()
                s = run_kg_pipeline(spark, repos, out,
                                    n_buckets=args.buckets, resume=False,
                                    files_per_bucket=fpb)
                results[key].append({
                    "wall": round(time.time() - t0, 1),
                    "stage_walls": s["stage_walls"],
                })
                counts[key] = s["stages"]
                burns.append(round(_burn(), 2))

        print(json.dumps({
            "n_files": args.n_files,
            "buckets": args.buckets,
            "fpb_variant": args.fpb,
            "runs": results,
            "counts": counts,
            "counts_equal": counts["fpb1"] == counts[f"fpb{args.fpb}"],
            "burn_1proc_sec": burns,
        }))
    finally:
        shutil.rmtree(args.workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
