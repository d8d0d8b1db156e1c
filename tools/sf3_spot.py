"""Heavy-operator spot check at sf3 (30x inflation) — extends the
measured scaling curve past sf1 for the iterative-graph / dedup /
pipeline rows most likely to break first. Numbers land in SCALE.md.

Usage: python tools/sf3_spot.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_data_anonymity_differential_privacy_spark import get_spark  # noqa: E402
from dbms_data_anonymity_differential_privacy_spark import queries_registry as qr  # noqa: E402
from dbms_data_anonymity_differential_privacy_spark.operators.util import (  # noqa: E402
    release_cached_relations,
)

NAMES = [
    "x126_pagerank_dist",
    "x196_hits",
    "x166_bfs_dist",
    "x195_local_clustering",
    "x175_semantic_dedup_auto",
    "x176_line_dedup",
    "x03_minhash_lsh",
    "pipe_tcloseness_metrics",
    "x224_silhouette",
    "c01_k_anonymize_suppress",
    # round-9 debuts with non-trivial scale shapes: two shingle-pair
    # chains (x228), the 4x-exploded counter grid (x232), and the
    # signature join over the pair relation (x234)
    "x228_capture_recapture",
    "x232_count_min",
    "x234_minhash_estimate",
    # round-10 debut: planner audit — O(postings), no pair joins; its
    # curve should track the tokenize/df-aggregation cost, not pairs
    "x241_near_dup_plan",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf3.0"
    spark = get_spark(app_name="sf3spot")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qr.QUERIES["p01_scan"](spark, sf_dir))
    out: dict = {}
    for n in NAMES:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            release_cached_relations()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            try:
                force(qr.QUERIES[n](spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                out[n] = f"ERROR {type(e).__name__}: {e}"[:200]
                break
            best = min(best, time.perf_counter() - t0)
        else:
            out[n] = round(best, 2)
        print("SF3", n, out[n], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "times": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
