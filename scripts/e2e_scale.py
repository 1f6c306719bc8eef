"""End-to-end KG pipeline scale point: synthesize N files (distributed,
seed=99 family) and run the full pipeline warm, reporting wall + stage
walls + files/s + burn calibration as ONE JSON line.

    python scripts/e2e_scale.py 1000000 [--buckets 32] [--cpus 32]

"Warm" per the repo's measurement discipline (BASELINE.md): a small
pipeline run in the same JVM first, so codegen + Python-worker spinup
(~16-35 s on this box) is excluded from the timed run.  The input is
materialized to parquet before t0 — the scale point measures the
PIPELINE, not the generator.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _burn  # noqa: E402 (canonical calibration loop)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_files", type=int)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--files-per-bucket", default="auto",
                    help="write-parallelism multiplier for the bucketed "
                         "sinks (int or 'auto'; kg_pipeline._dyn_overwrite)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--workdir", default="/dev/shm/bns_e2e_scale")
    args = ap.parse_args()

    from biomedical_ner_spark.session import get_spark
    from biomedical_ner_spark.plans.kg_pipeline import run_kg_pipeline
    from biomedical_ner_spark.sources.repos import synthesize_repos_sql

    burn0 = _burn()
    spark = get_spark(app_name="bns-e2e-scale",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(4 * args.cpus, 64))
    spark.sparkContext.setLogLevel("ERROR")

    # try/finally: a failed run must not leave multi-GB parquet parked in
    # /dev/shm until the next invocation's pre-run rmtree
    shutil.rmtree(args.workdir, ignore_errors=True)
    try:
        in_path = f"{args.workdir}/repos.parquet"
        n_in_files = max(2 * args.cpus, 32)
        (synthesize_repos_sql(spark, args.n_files, seed=args.seed)
         .repartition(n_in_files)
         .write.mode("overwrite").parquet(in_path))
        repos = spark.read.parquet(in_path)

        fpb = (args.files_per_bucket if args.files_per_bucket == "auto"
               else int(args.files_per_bucket))

        # warm: full pipeline at 2k files in the same JVM (codegen + workers)
        warm_repos = synthesize_repos_sql(spark, 2000, seed=args.seed + 1)
        run_kg_pipeline(spark, warm_repos, f"{args.workdir}/warm",
                        n_buckets=args.buckets, resume=False,
                        files_per_bucket=fpb)

        burn_mid = _burn()
        t0 = time.time()
        summary = run_kg_pipeline(spark, repos, f"{args.workdir}/out",
                                  n_buckets=args.buckets, resume=False,
                                  files_per_bucket=fpb)
        wall = time.time() - t0
        burn1 = _burn()

        print(json.dumps({
            "n_files": args.n_files,
            "buckets": args.buckets,
            "files_per_bucket": fpb,
            "cpus": args.cpus,
            "wall_warm_sec": round(wall, 1),
            "files_per_sec": round(args.n_files / wall, 1),
            "stage_walls": summary["stage_walls"],
            "stages": summary["stages"],
            "burn_1proc_sec": [round(burn0, 2), round(burn_mid, 2),
                               round(burn1, 2)],
        }))
    finally:
        shutil.rmtree(args.workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
