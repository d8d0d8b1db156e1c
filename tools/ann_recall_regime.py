"""ANN recall at the production regime — round-10 verdict task 4.

x04_ann_lsh_topk / x04_ann_ivf_topk were recall-tested at sf0.01/sf0.1
only (toy corpora). This tool measures the SAME production operators
(`ann_topk_lsh`, `ivf_index`+`ivf_topk`, exact `cosine_topk` as ground
truth) on the 301k-row sf15 embedding corpus the SemDeDup escalation
proof builds (``tools/kmeans_escalation_proof.py`` — rebuild it first
if ``.bench_data/sf15_emb`` is missing), over a committed-seed query
sample:

- recall@10 vs exact top-10, mean over queries;
- wall per query (index/bucket build amortized separately);
- the probe-count/recall trade-off curve for IVF (n_probe sweep) and
  the plane-count curve for LSH (n_planes sweep).

Writes ANN_RECALL.json (committed); tests/test_round10_ops.py asserts
the recall floor at the committed operating point from that artifact.

Usage: python tools/ann_recall_regime.py [--queries 40]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

CORPUS = ".bench_data/sf15_emb/embeddings.parquet"
OUT = "ANN_RECALL.json"
SEED = 1013


def main() -> int:
    n_queries = 40
    argv = sys.argv[1:]
    if argv and argv[0] == "--queries":
        n_queries = int(argv[1])

    if not os.path.exists(CORPUS):
        print(
            f"{CORPUS} missing — run tools/kmeans_escalation_proof.py "
            "first (it rebuilds the corpus)"
        )
        return 2

    from pyspark.sql import functions as F

    from dbms_data_anonymity_differential_privacy_spark import get_spark
    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
        ivf_index,
        ivf_topk,
        lsh_bucket_signature,
    )
    from dbms_data_anonymity_differential_privacy_spark.operators.util import track_cached

    spark = get_spark()
    emb = track_cached(spark.read.parquet(CORPUS).persist())
    n = emb.count()
    dim = len(emb.first()["embedding"])

    # committed-seed query sample: hash-order the ids, take the first Q
    qrows = (
        emb.orderBy(F.xxhash64("vec_id", F.lit(SEED)))
        .limit(n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    print(f"corpus n={n} dim={dim}, {len(queries)} queries (seed {SEED})")

    # ---- exact ground truth (self-match excluded: recall of the query
    # row itself is trivial) --------------------------------------------
    truth: dict[int, list[int]] = {}
    t0 = time.time()
    for qid, qv in queries:
        rows = cosine_topk(emb.filter(F.col("vec_id") != qid), qv, k=10).collect()
        truth[qid] = [int(r["vec_id"]) for r in rows]
    exact_wall = (time.time() - t0) / len(queries)
    print(f"exact per-query wall {exact_wall:.2f}s")

    report: dict = {
        "corpus_rows": n,
        "dim": dim,
        "n_queries": len(queries),
        "seed": SEED,
        "exact_wall_per_query_sec": round(exact_wall, 3),
        "ivf": [],
        "lsh": [],
    }

    def recall(found: list[int], qid: int) -> float:
        return len(set(found) & set(truth[qid])) / 10.0

    # ---- IVF: one index, probe sweep ----------------------------------
    t0 = time.time()
    indexed, centroids = ivf_index(emb, n_lists=32, seed=7)
    indexed = track_cached(indexed.persist())
    indexed.count()
    ivf_build = time.time() - t0
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        rs = []
        for qid, qv in queries:
            rows = ivf_topk(
                indexed.filter(F.col("vec_id") != qid), centroids, qv,
                k=10, n_probe=n_probe,
            ).collect()
            rs.append(recall([int(r["vec_id"]) for r in rows], qid))
        wall = (time.time() - t0) / len(queries)
        row = {
            "n_lists": 32,
            "n_probe": n_probe,
            "recall_at_10": round(sum(rs) / len(rs), 4),
            "wall_per_query_sec": round(wall, 3),
            "build_sec": round(ivf_build, 1),
        }
        report["ivf"].append(row)
        print("ivf", row)

    # ---- LSH: plane sweep (bucket build amortized per setting) --------
    for n_planes in (4, 6, 8):
        t0 = time.time()
        bucketed = track_cached(
            lsh_bucket_signature(emb, n_planes, dim, seed=42).persist()
        )
        bucketed.count()
        build = time.time() - t0
        t0 = time.time()
        rs = []
        for qid, qv in queries:
            qdf = spark.createDataFrame([(qv,)], "embedding array<double>")
            qb = lsh_bucket_signature(qdf, n_planes, dim, seed=42).collect()[0][
                "lsh_bucket"
            ]
            cands = bucketed.filter(
                (F.col("lsh_bucket") == qb) & (F.col("vec_id") != qid)
            )
            from dbms_data_anonymity_differential_privacy_spark.operators.similarity import cosine_expr

            q = F.array(*[F.lit(float(x)) for x in qv])
            rows = (
                cands.select(
                    "vec_id",
                    F.round(
                        cosine_expr(F.col("embedding").cast("array<double>"), q), 6
                    ).alias("cos"),
                )
                .orderBy(F.desc("cos"), F.col("vec_id"))
                .limit(10)
                .collect()
            )
            rs.append(recall([int(r["vec_id"]) for r in rows], qid))
        wall = (time.time() - t0) / len(queries)
        # the loop amortizes ONE bucket build across queries (what a
        # deployment does); prove it returns exactly what the per-call
        # production operator returns on the first query
        qid0, qv0 = queries[0]
        op_rows = ann_topk_lsh(
            emb.filter(F.col("vec_id") != qid0), qv0, k=10,
            n_planes=n_planes, seed=42,
        ).collect()
        loop_rows = (
            bucketed.filter(
                (F.col("lsh_bucket") == lsh_bucket_signature(
                    spark.createDataFrame([(qv0,)], "embedding array<double>"),
                    n_planes, dim, seed=42,
                ).collect()[0]["lsh_bucket"]) & (F.col("vec_id") != qid0)
            )
            .select(
                "vec_id",
                F.round(
                    cosine_expr(
                        F.col("embedding").cast("array<double>"),
                        F.array(*[F.lit(float(x)) for x in qv0]),
                    ),
                    6,
                ).alias("cos"),
            )
            .orderBy(F.desc("cos"), F.col("vec_id"))
            .limit(10)
            .collect()
        )
        assert [r["vec_id"] for r in op_rows] == [r["vec_id"] for r in loop_rows], (
            "amortized loop diverged from ann_topk_lsh"
        )
        row = {
            "n_planes": n_planes,
            "recall_at_10": round(sum(rs) / len(rs), 4),
            "wall_per_query_sec": round(wall, 3),
            "build_sec": round(build, 1),
        }
        report["lsh"].append(row)
        print("lsh", row)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
