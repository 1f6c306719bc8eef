"""Same-session A/B for the mentions_arrow bench query (round-5 verdict
directive #2): time extract_mentions_arrow over the SAME sf0.1 documents
frame at several partition counts, interleaved round-robin with burn
calibration — the protocol that root-caused the r3 event_windows
regression.

Theories under test for the r4 2.06x driver-bench regression:
  (a) host phase (burns will say);
  (b) Arrow task granularity — 5k docs over 128 partitions is ~39 docs
      (~0.35 s) per task, under the >=0.5 s/task rule for Python stages
      (BASELINE.md); fatter partitions should win if so.

Usage: python scripts/ab_mentions_arrow.py [trials_per_config]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _burn, _prep_input  # noqa: E402


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from biomedical_ner_spark.operators import spans
    from biomedical_ner_spark.session import get_spark

    burn0 = _burn()
    spark = get_spark(app_name="bns-ab-mentions-arrow",
                      master="local[32]", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf = _prep_input(spark)

    parts = (128, 64, 32, 16)
    frames = {}
    for p in parts:
        df = (spark.read.parquet(f"{bench_sf}/documents.parquet")
              .repartition(p).persist())
        df.count()
        frames[p] = df

    # warm the Arrow path (python workers + codegen) before any timing
    spans.extract_mentions_arrow(
        frames[parts[0]].limit(500), text_col="text", id_col="doc_id"
    ).count()

    walls: dict[int, list[float]] = {p: [] for p in parts}
    count = None
    for _ in range(trials):
        for p in parts:  # interleave configs within each round
            t0 = time.time()
            count = spans.extract_mentions_arrow(
                frames[p], text_col="text", id_col="doc_id").count()
            walls[p].append(round(time.time() - t0, 3))
    burn1 = _burn()

    print(json.dumps({
        "query": "mentions_arrow",
        "sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "n_mentions": count,
        "trials": trials,
        "walls_by_partitions": {str(p): walls[p] for p in parts},
        "best_by_partitions": {str(p): min(walls[p]) for p in parts},
        "burn_1proc_sec": [round(burn0, 2), round(burn1, 2)],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
