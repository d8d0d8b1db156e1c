"""Per-query profiler for the optimization rounds.

For each named query: capture .explain("formatted"), run the noop sink
N times (bench methodology: clearCache + release_cached_relations before
every run, min reported), and count Spark jobs per run via the status
tracker — iterative operators' barrier jobs show up directly in the job
count, which the wall alone hides.

Usage:
  python tools/profile_query.py [--sf SF_DIR] [--plan-dir DIR] [--runs N] q1 [q2 ...]

Prints one line per query:
  <name>  min=<s> runs=[..] jobs=<n_jobs_last_run> exch=<Exchange count in plan>
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_data_anonymity_differential_privacy_spark import get_spark  # noqa: E402
from dbms_data_anonymity_differential_privacy_spark.operators.util import (  # noqa: E402
    release_cached_relations,
)
from dbms_data_anonymity_differential_privacy_spark import queries_registry as qr  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None, help="write <name>.txt formatted plans here")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + parquet + codegen, same as bench
    spark.catalog.clearCache()
    qr.QUERIES["p01_scan"](spark, args.sf).write.format("noop").mode("overwrite").save()

    # Job counting via a FRESH job group per run (r10 advisory: counting
    # len(getJobIdsForGroup(None)) deltas undercounts once the UI status
    # store evicts jobs past spark.ui.retainedJobs in long profiling
    # sessions; a per-run group id is exact as long as the run itself
    # stays under the retention limit, which single queries do).
    import contextlib
    import io

    tracker = spark.sparkContext.statusTracker()
    for name in args.queries:
        fn = qr.QUERIES[name]
        times = []
        jobs_last = 0
        plan_txt = None
        for i in range(args.runs):
            spark.catalog.clearCache()
            release_cached_relations()
            group = f"profile:{name}:run{i}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if plan_txt is None:
                # public-API capture (df.explain prints to stdout)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan_txt = buf.getvalue()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            jobs_last = len(tracker.getJobIdsForGroup(group) or [])
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        spark.sparkContext.setJobDescription(None)
        n_exch = plan_txt.count("Exchange") if plan_txt else -1
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan_txt or "")
        print(
            f"{name}  min={min(times):.3f} runs={times} jobs={jobs_last} exch={n_exch}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
