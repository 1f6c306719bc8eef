"""Isolated A/B of the bucketed relations WRITE at two sharding levels.

The full-pipeline sharding A/B (scripts/ab_write_sharding.py) showed
fpb=4 consistently slower at 1M files but with heavy host drift mixed
into three stages of pipeline work.  This probe isolates the variable:
build the relations stream ONCE (full pipeline at N files), persist it,
then alternate timed `_dyn_overwrite` writes at files_per_bucket=1 vs
the sharded setting, with burn calibration around every write.  If the
fpb>1 walls stay >= fpb=1 walls at equal burn, the write is
bandwidth/overhead bound on this box rather than parallelism-capped at
n_buckets tasks.

Usage: python scripts/ab_relations_write.py 1000000 [--buckets 32]
       [--fpb 4] [--rounds 3] [--cpus 32]
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
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--workdir", default="/dev/shm/bns_ab_relwrite")
    args = ap.parse_args()

    from biomedical_ner_spark.plans.kg_pipeline import (
        _dyn_overwrite, run_kg_pipeline)
    from biomedical_ner_spark.session import get_spark
    from biomedical_ner_spark.sources.repos import synthesize_repos_sql

    spark = get_spark(app_name="bns-ab-relwrite",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(4 * args.cpus, 64))
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.workdir, ignore_errors=True)
    try:
        # Build the relations stream once via the real pipeline, then
        # read it back WITHOUT the bucket dir structure so every timed
        # write performs the full exchange + partitionBy itself.
        repos = (synthesize_repos_sql(spark, args.n_files, seed=args.seed)
                 .repartition(max(2 * args.cpus, 32)))
        run_kg_pipeline(spark, repos, f"{args.workdir}/pipe",
                        n_buckets=args.buckets, resume=False)
        # no in-heap persist: 38.9M rows of old-gen under ParallelGC caused
        # a >120 s full-GC pause that expired the heartbeat (fatal in local
        # mode).  Both variants re-scan the same tmpfs parquet, so the scan
        # cost cancels out of the A/B.
        rel = spark.read.parquet(f"{args.workdir}/pipe/relations")
        n_rel = rel.count()

        # warm both write shapes (codegen + committers)
        for fpb in (1, args.fpb):
            _dyn_overwrite(rel.limit(50000), f"{args.workdir}/warm{fpb}",
                           files_per_bucket=fpb, n_buckets=args.buckets)

        walls: dict[str, list] = {"fpb1": [], f"fpb{args.fpb}": []}
        burns = [round(_burn(), 2)]
        for _ in range(args.rounds):
            for key, fpb in (("fpb1", 1), (f"fpb{args.fpb}", args.fpb)):
                out = f"{args.workdir}/out_{key}"
                shutil.rmtree(out, ignore_errors=True)
                t0 = time.time()
                _dyn_overwrite(rel, out, files_per_bucket=fpb,
                               n_buckets=args.buckets)
                walls[key].append(round(time.time() - t0, 1))
                burns.append(round(_burn(), 2))

        n_files = {
            key: sum(len([f for f in files if f.endswith(".parquet")])
                     for _, _, files in os.walk(f"{args.workdir}/out_{key}"))
            for key in walls
        }
        print(json.dumps({
            "n_input_files": args.n_files,
            "n_relations": n_rel,
            "buckets": args.buckets,
            "fpb_variant": args.fpb,
            "write_walls_sec": walls,
            "out_parquet_files": n_files,
            "burn_1proc_sec": burns,
        }))
    finally:
        shutil.rmtree(args.workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
