"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every config below is chosen so the
same code is correct and fast on a multi-executor cluster:

- AQE on (runtime coalescing + skew-join splitting — equivalence classes in
  anonymization workloads are typically heavily skewed).
- Arrow on for any pandas-UDF path.
- ``spark.sql.shuffle.partitions`` sized for the test scale; on a real
  cluster AQE coalesces / splits from this initial number anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbms-data-anonymity-dp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a cluster, leave ``master`` to spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Smaller AQE target partitions: privacy/dedup workloads are
        # CPU-bound per row (regex, hashes, window EMD), so favor
        # parallelism over fewer/larger shuffle partitions. 16 MB still
        # amortizes task overhead fine at cluster scale.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # Allow shuffled-hash join where its size conditions hold (one
        # side small enough to hash-build per partition): skips the two
        # per-partition sorts a sort-merge join pays, with AQE's skew
        # handling still applying. Measured at sf0.1 over the 22 most
        # join-heavy queries: 45.2 s vs 48.8-52.7 s (r10; guide §3.1/§9
        # baseline). Spill safety measured (SCALE.md "Round-11 SHJ
        # spill-safety experiment", tools/shj_spill_experiment.py): on a
        # skewed 250 MB hot-key build in a 1.5 GB session the planner's
        # size conditions picked the SAFE build side on their own and
        # completed bit-identical to SMJ; the build-side OOM requires a
        # forced SHUFFLE_HASH hint (the engine uses none) and then fails
        # fast with a named "Can't acquire ... hash relation" error.
        # SPARK_GRAFT_PREFER_SMJ=true is the verified fallback for
        # clusters that prefer SMJ's graceful sort-spill anyway.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects by default; read as long and convert in the reader
        # (testdata has no sub-microsecond precision — conversion lossless).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
