"""VERDICT item 7: SHJ spill-safety evidence.

The hazard ADVICE names: an equi-join whose BUILD side is skewed (one hot
key owning most build rows) and big enough that a per-partition hash build
exceeds a task's execution memory, in a memory-constrained session
(SPARK_GRAFT_DRIVER_MEM=1500m, local[4]) so a non-spilling hash build
would OOM if the hot partition must be held in memory.

Legs (argv[1]):
  shj        SHUFFLE_HASH hint + AQE skew join on (session default planner)
  shj_noaqe  SHUFFLE_HASH hint, AQE skew split disabled (the raw hazard)
  smj        SPARK_GRAFT_PREFER_SMJ=true escape hatch, no hint

Prints: executed join strategy, wall, spill totals, rows + checksum (all
legs must agree).
"""
import sys, time, json, os
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from pyspark.sql import functions as F
from dbms_data_anonymity_differential_privacy_spark import get_spark

leg = sys.argv[1] if len(sys.argv) > 1 else "shj"
spark = get_spark(app_name=f"r11_spill_{leg}")
sc = spark.sparkContext
sc.setLogLevel("ERROR")
if leg == "shj_noaqe":
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

probe = spark.range(0, 5_000_000).select(
    F.col("id"),
    # keys in [8, 100k): the hot build key 7 never matches, so the HASH
    # BUILD of the hot partition is the hazard, not result-row volume
    (F.pmod(F.xxhash64("id"), F.lit(99_992)) + 8).alias("k"),
)
build = (
    spark.range(0, 6_000_000)
    .select(
        F.when(F.pmod("id", F.lit(100)) < 85, F.lit(7)).otherwise(
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(100_000))
        ).alias("k"),
        F.concat(F.lit("p" * 32), F.col("id").cast("string")).alias("payload"),
        F.col("id").alias("bid"),
    )
)
if leg.startswith("shj"):
    build = build.hint("SHUFFLE_HASH")

agg = probe.join(build, on="k").agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.xxhash64("id", "payload").cast("decimal(38,0)")).alias("chk"),
)
import threading, subprocess, glob
_hiwater = 0
def _sample():
    global _hiwater
    while not _done.is_set():
        tot = 0
        for d in glob.glob("/tmp/blockmgr-*"):
            try:
                tot += int(subprocess.run(["du", "-sb", d], capture_output=True, text=True).stdout.split()[0])
            except Exception:
                pass
        _hiwater = max(_hiwater, tot)
        _done.wait(0.5)
_done = threading.Event()
threading.Thread(target=_sample, daemon=True).start()

t0 = time.perf_counter()
try:
    row = agg.collect()[0]
    ok, err = True, None
    wall = time.perf_counter() - t0
except Exception as exc:  # noqa: BLE001
    ok, err, row, wall = False, f"{type(exc).__name__}: {str(exc)[:400]}", None, time.perf_counter() - t0

_done.set()
import contextlib, io
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    agg.explain("formatted")
plan = buf.getvalue()
strategy = [ln.strip()[:90] for ln in plan.splitlines() if "Join" in ln and "=" not in ln][:4]

# spill evidence: high-water mark of the session's block-manager local
# dir (shuffle + spill files), sampled during the join by a daemon thread
spill_disk = getattr(sys.modules[__name__], "_hiwater", -1)
spill_mem = -1

out = {
    "leg": leg,
    "ok": ok,
    "err": err,
    "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
    "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    "prefer_smj_env": os.environ.get("SPARK_GRAFT_PREFER_SMJ"),
    "wall_sec": round(wall, 2),
    "rows": row["n"] if row else None,
    "checksum": str(row["chk"]) if row else None,
    "join_lines": strategy,
    "blockmgr_hiwater_bytes": int(_hiwater),
    }
print("RESULT " + json.dumps(out), flush=True)
