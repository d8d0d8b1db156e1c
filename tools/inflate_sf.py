"""Synthesize a larger scale factor from sf0.1 for scaling measurements.

sf1 parquet does not exist in this environment (TESTDATA.md ships
sf0.001/0.01/0.1), so the 10x step sf0.01->sf0.1 was the largest
measurable curve. This tool manufactures an ~sf1 dataset (default 10
copies of sf0.1) so the curve gets a 100x point — used by SCALE.md's
measured-scaling section, never by correctness oracles.

Inflation must not distort the *workload shape*, so each table is copied
with care:

- keys are remapped per copy (key + copy * stride) so uniqueness
  invariants hold and group counts scale by the copy factor;
- ``documents.text`` gets a per-copy suffix on every token. Word-order
  permutation is NOT enough: it changes n-gram shingles but preserves the
  token MULTISET, and the set-based representations (SimHash votes,
  unigram features) then see every doc as 10 exact feature-space clones —
  quadratic clone-clique blowup that says nothing about real scaling.
  Disjoint per-copy vocabularies keep within-copy similarity structure
  exactly (bijective token renaming) and make cross-copy similarity zero
  for every representation, so candidate volume scales like a corpus;
- ``embeddings.embedding`` is cyclically rotated per copy — norms and
  pairwise-distance distribution are preserved, directions differ, so
  ANN/cosine candidate structure scales honestly;
- small dimension tables are passed through unchanged.

Usage: python tools/inflate_sf.py [src_sf_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark import get_spark
from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

KEY_STRIDE = 1 << 40  # far above any sf0.1 key


def _retag_words(text: F.Column, copy: int) -> F.Column:
    """Bijective per-copy token renaming (suffix) — all-JVM expressions.
    Copy 0 keeps the original text byte-identical."""
    if copy == 0:
        return text
    words = F.split(text, r"\s+")
    return F.array_join(
        F.transform(words, lambda w: F.concat(w, F.lit(f"_c{copy}"))), " "
    )


def _rotate(arr: F.Column, k: int) -> F.Column:
    if k == 0:
        return arr
    return F.concat(F.slice(arr, k + 1, F.size(arr)), F.slice(arr, 1, F.lit(k)))


def inflate(spark: SparkSession, src: str, out: str, copies: int) -> None:
    def remap(df: DataFrame, copy: int, *key_cols: str) -> DataFrame:
        for c in key_cols:
            df = df.withColumn(c, F.col(c) + F.lit(copy * KEY_STRIDE))
        return df

    def build(name: str, per_copy) -> None:
        parts = [per_copy(load_table(spark, src, name), i) for i in range(copies)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{copies} written")

    # c_name gets a per-copy TWO-char tag: TPC-H names are unique within a
    # copy, and verbatim copies would form 10-clone cliques whose lev<=1
    # pair count grows ~quadratically in copies (the same clone artifact
    # the documents retag fixes). Two identical chars keep every
    # cross-copy name pair at distance >= 2 (outside any lev<=1 search)
    # while within-copy distances are untouched — pair volume scales
    # linearly in copies, like a real corpus.
    build(
        "customer",
        lambda df, i: remap(df, i, "c_custkey").withColumn(
            "c_name", F.concat(F.col("c_name"), F.lit("~" + chr(97 + i) * 2))
        ),
    )
    build("orders", lambda df, i: remap(df, i, "o_orderkey", "o_custkey"))
    build("events", lambda df, i: remap(df, i, "event_id", "user_id"))
    build(
        "documents",
        lambda df, i: remap(df, i, "doc_id").withColumn(
            "text", _retag_words(F.col("text"), i)
        ),
    )
    build(
        "embeddings",
        lambda df, i: remap(df, i, "vec_id").withColumn(
            "embedding", _rotate(F.col("embedding"), i)
        ),
    )
    # lineitem + its part/supplier dimensions inflate WITH remapped keys
    # (r6 verdict task 2): the co-purchase and supplier→customer graphs
    # derive from lineitem⋈orders / lineitem self-joins, and a
    # passthrough lineitem kept those graphs the SAME size at every sf —
    # the *_dist iterative plans were only ever measured on fixed-size
    # graphs. Per-copy key remapping on all three FK columns produces
    # `copies` disjoint isomorphic copies of each graph: nodes and edges
    # scale by the copy factor while the degree distribution (the skew
    # that drives join fan-out) is preserved exactly. FK integrity
    # holds copy-by-copy (orders/part/supplier remap with the same
    # stride), so every registry join keeps its per-copy hit rate.
    #
    # part/supplier keys use a DENSE stride (max source key + 1, keys
    # are 0..N0-1) instead of KEY_STRIDE: the negative-sampling family
    # (x132/x133) probes items by `1 + hash % count(dim)`, a DENSE-range
    # lookup — a 2^40 stride would leave 90% of generated candidates
    # pointing at key-space holes, silently collapsing the existence-
    # join hit rate the sf1 rows are supposed to measure at 10x.
    def dense_stride(name: str, key: str) -> int:
        return (
            load_table(spark, src, name).agg(F.max(F.col(key))).collect()[0][0] + 1
        )

    part_stride = dense_stride("part", "p_partkey")
    supp_stride = dense_stride("supplier", "s_suppkey")

    def remap_strided(df: DataFrame, copy: int, col_strides: dict) -> DataFrame:
        for c, stride in col_strides.items():
            df = df.withColumn(c, F.col(c) + F.lit(copy * stride))
        return df

    build(
        "lineitem",
        lambda df, i: remap_strided(
            df,
            i,
            {
                "l_orderkey": KEY_STRIDE,
                "l_partkey": part_stride,
                "l_suppkey": supp_stride,
            },
        ),
    )
    build("part", lambda df, i: remap_strided(df, i, {"p_partkey": part_stride}))
    build(
        "supplier", lambda df, i: remap_strided(df, i, {"s_suppkey": supp_stride})
    )
    # true dimension tables pass through so every registry query still runs
    for name in ("region", "nation"):
        load_table(spark, src, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: passthrough")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_data/sf1.0"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="inflate")
    spark.sparkContext.setLogLevel("ERROR")
    inflate(spark, src, out, copies)


if __name__ == "__main__":
    main()
