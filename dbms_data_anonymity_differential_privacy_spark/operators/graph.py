"""Graph analytics over edge relations derived from the fact tables.

Connected components lives in ``operators/dedup.py`` (it grew out of
near-dup clustering); this module holds the *ranking* side, starting
with fixed-iteration PageRank — the standard importance measure for
entity graphs a warehouse derives (supplier→customer flows, co-purchase
networks, citation/link graphs in a crawl corpus).

**Exactness discipline**: ranks are kept in integer parts-per-billion
with floor division at every step (teleport ``150_000_000 // N``,
damping ``(17 * x) // 20`` = 0.85, contribution ``r // out_degree``).
Integer sums are order-independent, so the result is bit-identical
across Spark's nondeterministic shuffle reduction order AND across
engines — the DuckDB twin replays the same iterations with ``//``.
The ppb quantization error after 10 iterations is < 1e-6 of total mass:
irrelevant for ranking, decisive for hash-checkability. Dangling-node
mass is dropped (not redistributed) identically in both engines.

Hybrid physical strategy (same AQE-style runtime decision as
``dedup.connected_components``): edge lists at or under
``driver_threshold`` — 16-byte rows, so 2M edges ≈ 32 MB — collect once
and iterate in a Python dict loop (one Spark job total); larger graphs
run the distributed loop: the edge relation and per-iteration rank
relation are ids-only, hash-partitioned on the join key, ranks persisted
per round and unpersisted after the next round materializes (bounded
lineage). Ten fixed iterations = ten shuffles of a slim relation, never
of fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark.operators.util import (
    bounded_loop_plan,
)

PPB = 1_000_000_000
TELEPORT_PPB = 150_000_000  # (1 - 0.85) * PPB exactly
BARRIER_EVERY = 5  # distributed-PageRank rounds per materialization barrier


def pagerank_int(
    edges: DataFrame,
    iters: int = 10,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge relation.

    ``edges`` must have columns ``src`` and ``dst``; duplicate edges are
    NOT deduplicated here (dedup upstream if multiplicity is not
    intended — multiplicity weights the walk). Returns ``(node,
    rank_ppb)`` for every node appearing as src or dst.

    Update rule (all integer):
        r_0(v)   = PPB // N
        r_i+1(v) = TELEPORT_PPB // N + (17 * sum_{u->v} (r_i(u) // deg(u))) // 20
    """
    slim = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).persist()
    # The count exists to pick the driver-vs-distributed path; when the
    # caller FORCES the distributed plan (driver_threshold <= 0, the
    # x126_dist flavor) the edge count instead rides edges_deg.count()
    # below — one fewer full-pipeline action (r11: x126_pagerank_dist is
    # scheduling-bound at sf0.1, 22 jobs measured).
    n_edges = slim.count() if driver_threshold > 0 else None

    if n_edges is not None and n_edges <= driver_threshold:
        import numpy as np

        # Arrow transfer + vectorized int64 iteration: the same floor
        # divisions as the distributed path (numpy // on int64 is exact
        # floor division), ~50ms per iteration at 2M edges vs seconds
        # for a Python dict loop; equivalence to the distributed path is
        # pinned in tests/test_round5_ops.py.
        pdf = slim.toPandas()
        slim.unpersist()
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        src_i, dst_i = inv[: len(src)], inv[len(src):]
        n = len(nodes)
        deg = np.bincount(src_i, minlength=n)
        rank = np.full(n, PPB // n, dtype=np.int64)
        for _ in range(iters):
            share = rank[src_i] // deg[src_i]
            contrib = np.zeros(n, dtype=np.int64)
            np.add.at(contrib, dst_i, share)
            rank = TELEPORT_PPB // n + (17 * contrib) // 20
        schema = T.StructType(
            [
                T.StructField("node", T.LongType(), False),
                T.StructField("rank_ppb", T.LongType(), False),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [(int(v), int(r)) for v, r in zip(nodes, rank)], schema
        )

    nodes_df = (
        slim.select(F.col("src").alias("node"))
        .unionByName(slim.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes_df.count()  # also materializes slim's cache
    if n_edges is None:
        # cache-resident count (slim was materialized by the nodes job
        # above): one fast job instead of the full-pipeline count the
        # forced-distributed path used to pay up front (r11)
        n_edges = slim.count()

    # The iteration state holds ONLY nodes with in-edges (the contrib
    # relation). A node with no in-edges has the CONSTANT rank
    # TELEPORT_PPB//n after round 1 (PPB//n before round 1), so instead
    # of a per-round left join against the full node relation, the
    # edge-side join coalesces missing ranks to that round's default —
    # one join + one aggregation per round, nothing else. Round 1 skips
    # the join entirely (every rank is the PPB//n literal). Values are
    # bit-identical to the dense formulation (oracle-checked).
    if iters < 1:
        out0 = nodes_df.select("node", F.lit(PPB // n).alias("rank_ppb"))
        out0 = out0.localCheckpoint(eager=True)
        nodes_df.unpersist()
        slim.unpersist()
        return out0
    rank = None  # (node, rank_ppb) for nodes WITH in-edges; None = round 0
    default = PPB // n
    persisted = None  # the last MATERIALIZED rank relation
    # AQE adds per-stage re-planning latency to every one of the loop's
    # exchanges with nothing to decide for slim fixed-shape rounds —
    # scoped off below the size gate (r10 optimization; see
    # util.bounded_loop_plan for the measurement and the 100 TB rationale)
    with bounded_loop_plan(edges.sparkSession, n_edges):
        deg_df = slim.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
        # degree rides the edge relation so each iteration is ONE join of
        # ranks onto (src, dst, deg) — not a second degree join per round.
        # Built and materialized INSIDE the loop scope (r11): the build
        # join leaves the cache hash-partitioned by src at the loop's
        # exact partition count, so the per-round rank join reuses the
        # cached layout instead of re-exchanging the edge relation every
        # round (an AQE-coalesced build partitioning satisfies no loop
        # requirement — measured as one extra 500k-row exchange/round at
        # sf0.1).
        edges_deg = slim.join(deg_df, on="src").persist()
        edges_deg.count()
        slim.unpersist()
        for i in range(1, iters + 1):
            if rank is None:
                shared = edges_deg.select(
                    F.col("dst").alias("node"),
                    F.expr(f"{default}L div __deg").alias("__share"),
                )
            else:
                shared = (
                    edges_deg.join(rank, edges_deg["src"] == rank["node"], "left")
                    .select(
                        F.col("dst").alias("node"),
                        F.expr(f"coalesce(rank_ppb, {default}L) div __deg").alias(
                            "__share"
                        ),
                    )
                )
            new_rank = (
                shared.groupBy("node")
                .agg(F.sum("__share").alias("__c"))
                .select(
                    "node",
                    (
                        F.lit(TELEPORT_PPB // n)
                        + F.expr("(17 * __c) div 20")
                    ).alias("rank_ppb"),
                )
            )
            # Barrier every BARRIER_EVERY rounds: each persist + count +
            # unpersist is a fixed scheduling cost (~1.9 s/round at sf0.1,
            # r6 verdict), and the in-between rounds ride lazily on the
            # last barrier's cache — up to BARRIER_EVERY slim joins +
            # aggregations per materialized stage, so lineage stays
            # bounded while the barrier count drops 5x (measured at
            # sf0.1: 18.6 s per-round → 10.2 s batched). On executor loss
            # recomputation rolls back at most BARRIER_EVERY rounds — the
            # standard iterative-checkpoint trade. The FINAL round gets no
            # barrier of its own: the closing nodes-join + localCheckpoint
            # below is itself an eager action, so a count here would
            # materialize the same rounds twice (r11 fusion; r10 verdict
            # item 1 — one job and one cache pass fewer). Values are a
            # pure plan refactor: bit-identical (oracle row unchanged,
            # dist≡driver equivalence pinned in tests).
            if i % BARRIER_EVERY == 0 and i != iters:
                new_rank = new_rank.persist()
                new_rank.count()
                if persisted is not None:
                    persisted.unpersist()
                persisted = new_rank
            rank = new_rank
            default = TELEPORT_PPB // n  # rank of no-in-edge nodes, rounds >= 1
        # re-attach the constant-rank nodes (no in-edges) once, at the end;
        # the eager localCheckpoint doubles as the last rounds' barrier
        # (fusion above) and truncates the lineage so every per-round cache
        # AND the node relation can be released immediately (no cache
        # residue across repeated calls in one session — kcore discipline)
        out = nodes_df.join(rank, on="node", how="left").select(
            "node", F.coalesce("rank_ppb", F.lit(default)).alias("rank_ppb")
        )
        out = out.localCheckpoint(eager=True)
    if persisted is not None:
        persisted.unpersist()
    nodes_df.unpersist()
    edges_deg.unpersist()
    return out


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle census of an undirected graph.

    ``edges`` holds one row per undirected edge (``src``/``dst``, either
    orientation, no self-loops required to be pre-filtered). Returns one
    row: ``(n_nodes, n_edges, n_triangles, n_triples,
    clustering_coeff_r)`` with the global (transitivity) coefficient
    ``3*T / #connected-triples`` and ``#triples = Σ_v deg(v)·(deg(v)-1)/2``
    — all integer until the single final division.

    Physical strategy — the Suri–Vassilvitskii degree orientation
    ("counting triangles and the curse of the last reducer", WWW 2011):
    orient every edge from the (degree, id)-smaller endpoint to the
    larger. Every triangle has exactly one orientation-consistent wedge,
    and each node's ORIENTED out-degree is O(sqrt(|E|)), so the
    wedge-generating self-join fans out by max oriented out-degree, not
    by the max raw degree — the hot-node blowup (a celebrity node with
    10^6 neighbors would otherwise emit 10^12 wedges) structurally
    cannot happen. Wedges then semi-join the oriented edge set. Three
    slim shuffles of 16-byte id pairs; payloads never move.
    """
    canon = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionByName(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # orient: from lower (deg, id) to higher (deg, id)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    oriented = (
        canon.join(da, on="a")
        .join(db, on="b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select(F.col("e.u").alias("u"), F.col("e.w").alias("w"))
        .persist()
    )
    # wedges u->v, u->x generated in both (v,x) orders; the closing edge
    # exists in exactly ONE orientation, so each triangle survives the
    # semi-join exactly once (the apex u is the (deg,id)-minimum vertex)
    e1 = oriented.select(F.col("u"), F.col("w").alias("v"))
    e2 = oriented.select(F.col("u"), F.col("w").alias("x"))
    wedges = e1.join(e2, on="u").filter(F.col("v") != F.col("x"))
    closing = oriented.select(F.col("u").alias("v"), F.col("w").alias("x"))
    tri = wedges.join(closing, on=["v", "x"], how="left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    stats = canon.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).join(
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            # per-row integer halving (deg*(deg-1) is even) -> the sum
            # stays int64, matching the oracle's SUM(d*(d-1)//2)
            F.sum(F.expr("(deg * (deg - 1)) div 2")).cast("long").alias("n_triples"),
        )
    )
    return stats.join(n_tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_triples",
        F.round(
            F.when(
                F.col("n_triples") > 0,
                3.0 * F.col("n_triangles") / F.col("n_triples"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("clustering_coeff_r"),
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int | None = None,
) -> DataFrame:
    """X149 — k-core of an undirected graph: iteratively peel nodes with
    degree < ``k`` until fixpoint (Seidman 1983) — the standard dense-
    subgraph screen behind community seeding, spam/bot-ring detection
    and graph-sampling curricula; composes with the x138 co-purchase
    graph exactly like triangles do.

    ``edges`` are distinct undirected pairs ``(x, y)`` with ``x < y``.
    Each peel round is ONE degree aggregation over the surviving edge
    relation + two semi-joins back — the edge relation only ever
    SHRINKS, so rounds get cheaper; no adjacency matrix, no driver
    collection. ``rounds=None`` iterates to convergence (one extra
    scalar count per round, the x03-cc convergence-flag discipline);
    a FIXED ``rounds`` replays exactly that many peels — the oracle-
    replayable form (x126's fixed-iteration precedent), identical to
    the converged answer once the graph stabilizes (tests pin this).

    Output: ``(node, degree)`` for nodes with >= 1 surviving incident
    edge, degree measured in the final surviving subgraph.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # Each round's plan references the previous round's relation three
    # times (degree union + two semi-joins); left lazy, the nested tree
    # grows ~3^rounds and Catalyst analysis explodes. localCheckpoint
    # TRUNCATES lineage every round — the iterative-graph discipline
    # x126's distributed path uses — so round r always optimizes a
    # two-join plan over a materialized edge relation. (Executor-local
    # storage: on a cluster, a lost executor re-runs the job — the
    # standard trade for iterative graph loops; checkpoint() to a
    # reliable store if that matters.)
    e = edges.select("x", "y").localCheckpoint(eager=True)
    i = 0
    prev_cnt = None
    while True:
        if rounds is not None and i >= rounds:
            break
        if rounds is None:
            cnt = e.count()
            if cnt == prev_cnt:
                break
            prev_cnt = cnt
        deg = (
            e.select(F.col("x").alias("v"))
            .unionAll(e.select(F.col("y").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        surv = deg.filter(F.col("d") >= k).select("v")
        nxt = (
            e.join(surv.withColumnRenamed("v", "x"), "x", "left_semi")
            .join(surv.withColumnRenamed("v", "y"), "y", "left_semi")
            .select("x", "y")
            .localCheckpoint(eager=True)
        )
        e = nxt
        i += 1
    out = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return out


def assortativity(edges: DataFrame) -> DataFrame:
    """X151 — degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over edges — positive = hubs link
    hubs (social nets), negative = hubs link leaves (the co-purchase /
    infrastructure signature). The one-scalar structure probe next to
    the triangle census (x138) and k-core (x149).

    ``edges`` are distinct undirected ``(x, y)``, x < y. Each edge
    contributes BOTH directed pairs (the standard symmetric treatment),
    so the closed form collapses to

        r = (|P|·Σjk − S²) / (|P|·Q − S²)

    over the directed-pair multiset P (|P| = 2M), S = Σj, Q = Σj²,
    C = Σjk — all exact DECIMAL(38,0) integers (degree products over
    int64 edges; the x109 overflow-proof convention), released with ONE
    IEEE division. NULL when all degrees are equal (zero variance).

    Shape: one degree aggregation, degrees join back onto the edge
    relation on node keys (AQE decides broadcast — the degree relation
    is nodes-sized), ONE sufficient-statistics aggregation. No windows,
    no iteration.

    Output (single row): ``(n_nodes, n_edges, r_assort)``.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.util import (
        bounded_plan_result,
        track_cached,
    )

    DEC = "decimal(38,0)"
    # the edge relation feeds the degree union TWICE plus the join-back:
    # without a persist the (often expensive) upstream edge construction
    # appears 3-4x in the plan and ReusedExchange only sometimes dedupes
    # it (measured at sf0.1 on the co-purchase build: 4.4 s -> 3.4 s)
    edges = track_cached(edges.persist())
    # materialize the edge cache with the session plan and learn its size
    # (the bounded-plan gate for the slim degree-join cascade below; see
    # util.bounded_plan_result — measured at sf0.1: 3.0-3.6 s -> 2.0 s)
    n_edge_rows = edges.count()
    deg = (
        edges.select(F.col("x").alias("v"))
        .unionAll(edges.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dx = deg.withColumnRenamed("v", "x").withColumnRenamed("d", "dx")
    dy = deg.withColumnRenamed("v", "y").withColumnRenamed("d", "dy")
    e = edges.join(dx, "x").join(dy, "y")
    # both directed orientations: (dx, dy) and (dy, dx)
    pairs = e.select(F.col("dx").alias("j"), F.col("dy").alias("k")).unionAll(
        e.select(F.col("dy").alias("j"), F.col("dx").alias("k"))
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast(DEC).alias("p"),
        F.sum(F.col("j").cast(DEC)).alias("s"),
        F.sum((F.col("j") * F.col("j")).cast(DEC)).alias("q"),
        F.sum((F.col("j") * F.col("k")).cast(DEC)).alias("c"),
    )
    # ONE Spark action: n_edges = |P|/2 falls straight out of the pairs
    # aggregation (p = 2M, always even) and n_nodes rides along as a
    # broadcast 1-row agg — the old separate deg.count()/edges.count()
    # driver actions recomputed the upstream edge build up to 3× per call.
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    num = F.col("p") * F.col("c") - F.col("s") * F.col("s")
    den = F.col("p") * F.col("q") - F.col("s") * F.col("s")
    out = s.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        (F.col("p") / F.lit(2)).cast("long").alias("n_edges"),
        F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")), 9
        ).alias("r_assort"),
    )
    return bounded_plan_result(out, n_edge_rows)


def powerlaw_alpha(edges: DataFrame, d_min: int = 2, exact: bool = True) -> DataFrame:
    """X152 — power-law exponent of the degree distribution by the
    discrete MLE approximation of Clauset, Shalizi & Newman (SIAM Rev.
    2009, eq. 3.7):

        alpha = 1 + n_tail / Σ_{d_i >= d_min} ln(d_i / (d_min - 0.5))

    — the scale-free-ness probe next to the Zipf fit (x128, token
    frequencies): heavy-tailed degree structure decides whether skew
    salting and hot-key handling matter for graph joins downstream.

    Exactness: ln values come from the driver-built C-libm table over
    the DISTINCT degree values (bounded by max degree — the x23/x128
    idiom; DuckDB's ln binds the same libm), the tail sum is a sorted
    left fold of cnt·ln terms over the distinct-degree relation, and
    alpha is a fixed two-op double expression. NULL when the tail is
    empty or every tail degree equals d_min... (zero log-sum).

    Shape: one degree aggregation + one distinct-degree collapse; the
    fold runs on the distinct-degree relation (kilobytes).

    Output (single row): ``(n_tail, d_min, alpha_r)``.
    """
    import math

    if d_min < 1:
        raise ValueError(f"d_min must be >= 1, got {d_min}")
    spark = edges.sparkSession
    deg = (
        edges.select(F.col("x").alias("v"))
        .unionAll(edges.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    per_d = deg.groupBy("d").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("d") >= d_min
    ).persist()
    shift = d_min - 0.5
    if exact:
        dvals = sorted(int(r["d"]) for r in per_d.select("d").distinct().collect())
        ln_tab = spark.createDataFrame(
            [(d, math.log(d / shift)) for d in dvals], "d long, lnv double"
        )
        terms = per_d.join(F.broadcast(ln_tab), "d").select(
            (F.col("cnt").cast("double") * F.col("lnv")).alias("t"), F.col("cnt")
        )
    else:
        # production flavor (x23/x99/x128 exact-flag contract): JVM log
        # in codegen, no driver collect over the distinct-degree relation
        terms = per_d.select(
            (
                F.col("cnt").cast("double")
                * F.log(F.col("d").cast("double") / F.lit(shift))
            ).alias("t"),
            F.col("cnt"),
        )
    fold = F.expr(
        "aggregate(array_sort(collect_list(t)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    )
    s = terms.agg(F.sum("cnt").alias("n_tail"), fold.alias("lsum"))
    alpha = F.when(
        F.col("lsum") > 0,
        F.lit(1.0) + F.col("n_tail").cast("double") / F.col("lsum"),
    )
    return s.select(
        F.col("n_tail").cast("long").alias("n_tail"),
        F.lit(d_min).cast("int").alias("d_min"),
        F.round(alpha, 9).alias("alpha_r"),
    )


def adamic_adar(edges: DataFrame, top: int = 20) -> DataFrame:
    """Adamic–Adar link prediction over an undirected edge relation.

    ``edges`` has one row per undirected edge with ``src < dst``. For
    every NON-adjacent pair (u, v) with at least one common neighbor,
    scores ``AA = sum_{w in N(u) ∩ N(v)} 1 / ln(deg(w))`` (deg(w) >= 2
    always holds for a common neighbor, so ln is positive) and returns
    the ``top`` pairs by (aa_r desc, u, v) — the classic
    missing-link ranking (Adamic & Adar 2003).

    Shape: wedge enumeration is the one heavy stage — a self-join of the
    adjacency relation on the center node, emitting Σ_w deg(w)² pairs.
    That is the canonical AA cost; at crawl scale cap hub degrees
    upstream (drop w with deg above a threshold — hubs contribute
    ~1/ln(deg) ≈ 0 anyway). Everything else is slim: an 8-byte degree
    relation broadcast onto the wedges, one (u,v) aggregation, an
    anti-join against the edge list, and a distributed TakeOrdered for
    the final cut (no single-reducer window).
    """
    # Persist the slim edge list: four consumers (two wedge sides,
    # degrees, the final anti-join) would otherwise each replay the
    # upstream edge construction. The adjacency doubling stays lazy —
    # it is a map over the cached relation.
    pr = edges.select(
        F.col("src").cast("long").alias("x"), F.col("dst").cast("long").alias("y")
    ).persist()
    nb = pr.selectExpr("x AS node", "y AS nbr").unionAll(
        pr.selectExpr("y AS node", "x AS nbr")
    )
    deg = nb.groupBy(F.col("node").alias("w")).agg(F.count(F.lit(1)).alias("d"))
    a, b = nb.alias("a"), nb.alias("b")
    wedges = a.join(
        b, (F.col("a.nbr") == F.col("b.nbr")) & (F.col("a.node") < F.col("b.node"))
    ).select(
        F.col("a.node").alias("u"), F.col("b.node").alias("v"), F.col("a.nbr").alias("w")
    )
    cand = (
        wedges.join(F.broadcast(deg), on="w", how="inner")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("aa_r"),
        )
    )
    nonedge = cand.join(
        pr, on=[cand["u"] == pr["x"], cand["v"] == pr["y"]], how="left_anti"
    )
    return nonedge.orderBy(
        F.col("aa_r").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(top)


def label_propagation(
    edges: DataFrame, iters: int = 3, driver_threshold: int = 2_000_000
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) made fully
    deterministic: every round each node adopts the most frequent label
    among its neighbors, ties broken by SMALLEST label — no RNG, no
    visit order, so any engine replays the identical fixed-point
    trajectory. ``iters`` is fixed (not run-to-convergence) for the same
    reason the integer PageRank is fixed-iteration: a data-independent
    plan with a bounded number of shuffles.

    Per round: one join of the adjacency relation against the current
    (node, label) relation — ids-only, hash-partitioned on the join key
    — one (node, label) count aggregation, and one per-node top-1 window
    (partitioned, no global order). Labels persist per round and
    unpersist after the next materializes (x149 kcore lineage
    discipline).

    Returns ``(node, community)`` for every node with at least one edge.
    """
    from pyspark.sql import Window

    pr = edges.select(
        F.col("src").cast("long").alias("x"), F.col("dst").cast("long").alias("y")
    ).persist()
    n_edges = pr.count()

    if n_edges <= driver_threshold:
        import numpy as np

        # Same hybrid runtime choice as pagerank_int: a 16-byte-row edge
        # list at or under the threshold iterates in vectorized numpy on
        # the driver (one Spark job total). Per round the mode-with-
        # min-tie-break is one lexsort over the (node, -count, label)
        # message keys. Equivalence to the distributed path is pinned in
        # tests/test_round6_ops.py.
        pdf = pr.toPandas()
        pr.unpersist()
        src = pdf["x"].to_numpy(dtype=np.int64)
        dst = pdf["y"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        s_i, d_i = inv[: len(src)], inv[len(src):]
        a_node = np.concatenate([s_i, d_i])
        a_nbr = np.concatenate([d_i, s_i])
        n = len(nodes)
        lab = np.arange(n, dtype=np.int64)
        for _ in range(iters):
            key = a_node * n + lab[a_nbr]
            uk, cnt = np.unique(key, return_counts=True)
            k_node, k_lab = uk // n, uk % n
            order = np.lexsort((k_lab, -cnt, k_node))
            firsts = np.unique(k_node[order], return_index=True)[1]
            nxt = lab.copy()
            nxt[k_node[order][firsts]] = k_lab[order][firsts]
            lab = nxt
        return edges.sparkSession.createDataFrame(
            [(int(nodes[i]), int(nodes[lab[i]])) for i in range(n)],
            "node LONG, community LONG",
        )

    # scoped AQE-off for the bounded loop (see util.bounded_loop_plan)
    with bounded_loop_plan(edges.sparkSession, n_edges):
        # adj is the loop-invariant probe side of every round's join on
        # nbr: partition it by the join key INSIDE the loop scope (r11)
        # so the cached layout satisfies each round's requirement and
        # only the slim label relation re-exchanges per round
        adj = (
            pr.selectExpr("x AS node", "y AS nbr")
            .unionAll(pr.selectExpr("y AS node", "x AS nbr"))
            .repartition(F.col("nbr"))
            .persist()
        )
        labels = adj.select("node").distinct().select(
            "node", F.col("node").alias("label")
        ).persist()
        labels.count()
        pr.unpersist()
        w = Window.partitionBy("node").orderBy(
            F.col("__c").desc(), F.col("label").asc()
        )
        persisted = labels  # last MATERIALIZED label relation
        for i in range(1, iters + 1):
            msgs = adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), on="nbr"
            ).select("node", "label")
            nxt = (
                msgs.groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("__c"))
                .withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") == 1)
                .select("node", "label")
            )
            # pagerank barrier-batching discipline: materialize every
            # BARRIER_EVERY rounds (plus the last); in-between rounds chain
            # lazily on the last barrier's cache. Pure plan refactor —
            # labels are deterministic (mode + min tie-break), so values
            # are bit-identical (dist≡driver equivalence pinned in tests).
            if i % BARRIER_EVERY == 0 or i == iters:
                nxt = nxt.persist()
                nxt.count()
                persisted.unpersist()
                persisted = nxt
            labels = nxt
    adj.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def bfs_profile(
    edges: DataFrame,
    n_landmarks: int = 4,
    max_depth: int = 4,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Multi-source BFS distance profile from deterministic landmarks —
    the bounded-depth core of landmark-based closeness/diameter
    estimation (Potamias et al. 2009). Landmarks are the ``n_landmarks``
    SMALLEST node ids (data-independent tie-free choice); ``max_depth``
    is fixed so the plan has a bounded number of shuffles (pagerank/LPA
    discipline).

    Per round the reached set expands by one hop with the same
    formulation the SQL oracle unrolls: union the previous distances
    with (frontier ⋈ adjacency, dist+1) and keep the per-(landmark,
    node) MIN — revisits resolve by aggregation, no anti-join needed.
    All relations are ids-only; each round is one join + one
    aggregation, persisted and unpersisted kcore-style.

    Output: ``(landmark, dist, n_nodes)`` — how many nodes sit at each
    hop distance from each landmark (unreached nodes within the depth
    bound are simply absent).
    """
    pr = edges.select(
        F.col("src").cast("long").alias("x"), F.col("dst").cast("long").alias("y")
    ).persist()
    n_edges = pr.count()

    if n_edges <= driver_threshold:
        import numpy as np

        # pagerank/LPA hybrid discipline: small edge lists BFS on the
        # driver in one Spark job; equivalence pinned in tests.
        pdf = pr.toPandas()
        pr.unpersist()
        src = pdf["x"].to_numpy(dtype=np.int64)
        dst = pdf["y"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        s_i, d_i = inv[: len(src)], inv[len(src):]
        a_node = np.concatenate([s_i, d_i])
        a_nbr = np.concatenate([d_i, s_i])
        n = len(nodes)
        rows = []
        for lm in range(min(n_landmarks, n)):
            distv = np.full(n, -1, dtype=np.int64)
            distv[lm] = 0
            frontier = np.array([lm])
            for d in range(1, max_depth + 1):
                mask = np.isin(a_node, frontier)
                cand = np.unique(a_nbr[mask])
                cand = cand[distv[cand] < 0]
                if len(cand) == 0:
                    break
                distv[cand] = d
                frontier = cand
            for d in range(max_depth + 1):
                cnt = int((distv == d).sum())
                if cnt:
                    rows.append((int(nodes[lm]), d, cnt))
        return edges.sparkSession.createDataFrame(
            rows, "landmark LONG, dist INT, n_nodes LONG"
        )

    # scoped AQE-off for the bounded loop (see util.bounded_loop_plan)
    with bounded_loop_plan(edges.sparkSession, n_edges):
        # adj is the loop-invariant probe side of every round's frontier
        # join on node: partition it by the join key INSIDE the loop
        # scope (r11, same as label_propagation) so rounds re-exchange
        # only the frontier
        adj = (
            pr.selectExpr("x AS node", "y AS nbr")
            .unionAll(pr.selectExpr("y AS node", "x AS nbr"))
            .repartition(F.col("node"))
            .persist()
        )
        landmarks = (
            adj.select("node").distinct().orderBy("node").limit(n_landmarks)
        )
        dist = landmarks.select(
            F.col("node").alias("lm"), "node", F.lit(0).alias("dist")
        ).persist()
        dist.count()
        pr.unpersist()
        # Barrier every SECOND round here (not BARRIER_EVERY=5): each BFS
        # round consumes `dist` TWICE (frontier filter + union), so an
        # unmaterialized chain doubles the subplan per lazy level — depth-2
        # keeps the plan at <=4 copies of the last barrier (runtime cost is
        # deduplicated by exchange reuse, but ANALYSIS cost is not).
        persisted = dist
        for d in range(1, max_depth + 1):
            frontier = dist.filter(F.col("dist") == d - 1)
            expanded = frontier.join(adj, on="node").select(
                "lm", F.col("nbr").alias("node"), F.lit(d).alias("dist")
            )
            nxt = (
                dist.unionByName(expanded)
                .groupBy("lm", "node")
                .agg(F.min("dist").alias("dist"))
            )
            # the FINAL round gets no barrier: the output aggregation
            # below materializes it via an eager localCheckpoint inside
            # the AQE-off scope — a count here would compute the same
            # rounds twice (r11 fusion, same as pagerank_int)
            if d % 2 == 0 and d != max_depth:
                nxt = nxt.persist()
                nxt.count()
                persisted.unpersist()
                persisted = nxt
            dist = nxt
        # the aggregation consumes the last rounds exactly once, fused
        # into the barrier job; eager checkpoint so the caches below can
        # be released without forcing a recompute
        out = (
            dist.groupBy(F.col("lm").alias("landmark"), "dist")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    persisted.unpersist()
    return out


def _oriented_triangles(canon: DataFrame):
    """Shared oriented-triangle enumerator over a canonical (a < b,
    distinct) edge relation: returns ``(deg, tri)`` where ``deg`` is
    ``(v, degree)`` and ``tri`` has one row per triangle as ``(u, v, x)``
    with ``v < x`` (u = the Suri–Vassilvitskii (degree, id)-minimal
    apex). Used by :func:`local_clustering` (corner credit) and
    :func:`ktruss`'s :func:`_edge_support` (edge credit); the global
    :func:`triangle_count` keeps its original both-orders formulation —
    equivalence between the two is pinned by the per-node-sum = 3·T
    consistency test."""
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionByName(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("db"))
    oriented = (
        canon.join(da, on="a")
        .join(db, on="b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select(F.col("e.u").alias("u"), F.col("e.w").alias("w"))
    )
    e1 = oriented.select(F.col("u"), F.col("w").alias("v"))
    e2 = oriented.select(F.col("u"), F.col("w").alias("x"))
    wedges = e1.join(e2, on="u").filter(F.col("v") < F.col("x"))
    closing = oriented.select(
        F.least("u", "w").alias("v"), F.greatest("u", "w").alias("x")
    )
    tri = wedges.join(closing, on=["v", "x"], how="left_semi")
    return deg, tri


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient of an undirected graph:
    ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)-1))`` where ``T(v)`` is the
    number of triangles through ``v`` — the node-level refinement of
    :func:`triangle_count`'s global transitivity (Watts–Strogatz 1998).
    Nodes with ``deg < 2`` have no wedge and are excluded (their lcc is
    undefined, not zero).

    Output: ``(node, degree, n_tri, lcc_r)``, lcc rounded at 9 dp (one
    IEEE division over exact integers).

    Physical strategy: the shared :func:`_oriented_triangles` enumerator
    (Suri–Vassilvitskii degree orientation — wedge fan-out bounded by
    the oriented out-degree O(sqrt(|E|)), so the celebrity-node blowup
    cannot happen), then each triangle's three corners credited by one
    ``explode`` + count. Shuffles carry id pairs only.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.util import (
        bounded_plan_result,
        track_cached,
    )

    canon = track_cached(
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # materialize the canonical edge relation with the session plan (the
    # data-sized upstream build keeps AQE) and learn its size — the gate
    # for running the tiny wedge/credit cascade under the bounded plan
    # (see util.bounded_plan_result; measured at sf0.1: 4.6 s / 39 AQE
    # stage-jobs -> 2.1 s on a 3,573-edge graph, bit-identical output)
    n_edges = canon.count()
    deg, tri = _oriented_triangles(canon)
    per_node = (
        tri.select(F.explode(F.array("u", "v", "x")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    out = (
        deg.filter(F.col("degree") >= 2)
        .select(F.col("v").alias("node"), "degree")
        .join(per_node, on="node", how="left")
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                2.0 * F.coalesce("n_tri", F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                9,
            ).alias("lcc_r"),
        )
    )
    return bounded_plan_result(out, n_edges)


def hits_int(
    edges: DataFrame,
    iters: int = 8,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Fixed-iteration integer HITS (Kleinberg 1999) over a directed
    edge relation: hubs point to good authorities, authorities are
    pointed to by good hubs.

    Exactness discipline (the :func:`pagerank_int` contract): scores are
    integer parts-per-billion with floor division everywhere, so sums
    are shuffle-order-independent and hash-exact across engines. The
    usual L2 normalization is replaced by an integer mass rescale —
    after each half-step the vector is divided by ``scale = S // PPB + 1``
    (``S`` = total mass), keeping every score <= PPB and all arithmetic
    in int64 (per-node raw sums are bounded by the total mass <= N·PPB).

    Update (all integer)::

        h_0(v)   = PPB // N
        a'_i(v)  = sum_{u->v} h_{i-1}(u);  a_i = a' // (sum(a') // PPB + 1)
        h'_i(u)  = sum_{u->v} a_i(v);      h_i = h' // (sum(h') // PPB + 1)

    Returns ``(node, hub_ppb, auth_ppb)`` for every node; a node with no
    out-edges has hub 0 after round 1, no in-edges -> auth 0.

    Hybrid physical strategy: <= ``driver_threshold`` edges (16-byte
    rows) collect once into a vectorized numpy int64 loop; larger graphs
    run the distributed loop — per round TWO slim joins + aggregations
    (hub half-step, auth half-step) with a persist/count barrier per
    round pair, lineage truncated by an eager localCheckpoint at the
    end (the x126 discipline).
    """
    import numpy as np

    if iters < 1:
        # the ktruss/markov validation discipline: iters=0 would return
        # zero auth on the driver branch but crash the distributed branch
        # (auth never assigned) — inconsistent, so refuse it up front
        raise ValueError("hits_int requires iters >= 1")
    slim = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).persist()
    n_edges = slim.count()

    if n_edges <= driver_threshold:
        pdf = slim.toPandas()
        slim.unpersist()
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        src_i, dst_i = inv[: len(src)], inv[len(src):]
        n = len(nodes)
        if n == 0:  # empty edge relation: empty release, not a crash
            return edges.sparkSession.createDataFrame(
                [], "node LONG, hub_ppb LONG, auth_ppb LONG"
            )
        hub = np.full(n, PPB // n, dtype=np.int64)
        auth = np.zeros(n, dtype=np.int64)
        for _ in range(iters):
            a_raw = np.zeros(n, dtype=np.int64)
            np.add.at(a_raw, dst_i, hub[src_i])
            auth = a_raw // (a_raw.sum() // PPB + 1)
            h_raw = np.zeros(n, dtype=np.int64)
            np.add.at(h_raw, src_i, auth[dst_i])
            hub = h_raw // (h_raw.sum() // PPB + 1)
        schema = T.StructType(
            [
                T.StructField("node", T.LongType(), False),
                T.StructField("hub_ppb", T.LongType(), False),
                T.StructField("auth_ppb", T.LongType(), False),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [(int(v), int(h), int(a)) for v, h, a in zip(nodes, hub, auth)], schema
        )

    nodes_df = (
        slim.select(F.col("src").alias("node"))
        .unionByName(slim.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes_df.count()
    hub = nodes_df.select("node", F.lit(PPB // n).cast("long").alias("s"))
    auth = None
    for i in range(1, iters + 1):
        # each RAW half-step relation feeds BOTH its mass total and the
        # rescaled vector, so the LOGICAL plan doubles per half-step —
        # 2^(2*iters) copies of round 1 by the end; even with the data
        # persisted, plan-string generation alone OOMs the driver
        # (measured at sf1: the ktruss lesson again). Eager
        # localCheckpoints truncate the lineage each half-step; the
        # checkpointed blocks are slim (node, sum) relations.
        a_raw = (
            slim.join(hub.withColumnRenamed("node", "src"), on="src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("raw"))
            .localCheckpoint(eager=True)
        )
        a_tot = a_raw.agg(F.sum("raw").alias("t"))
        auth = a_raw.join(F.broadcast(a_tot)).select(
            "node", F.expr(f"raw div (t div {PPB} + 1)").alias("s")
        )
        h_raw = (
            slim.join(auth.withColumnRenamed("node", "dst"), on="dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("raw"))
            .localCheckpoint(eager=True)
        )
        h_tot = h_raw.agg(F.sum("raw").alias("t"))
        hub = h_raw.join(F.broadcast(h_tot)).select(
            "node", F.expr(f"raw div (t div {PPB} + 1)").alias("s")
        )
    out = (
        nodes_df.join(hub.withColumnRenamed("s", "hub_ppb"), on="node", how="left")
        .join(auth.withColumnRenamed("s", "auth_ppb"), on="node", how="left")
        .select(
            "node",
            F.coalesce("hub_ppb", F.lit(0)).cast("long").alias("hub_ppb"),
            F.coalesce("auth_ppb", F.lit(0)).cast("long").alias("auth_ppb"),
        )
    )
    out = out.localCheckpoint(eager=True)
    nodes_df.unpersist()
    slim.unpersist()
    return out


def _edge_support(cur: DataFrame) -> DataFrame:
    """Per-edge triangle support of a canonical (a < b) edge relation:
    the shared :func:`_oriented_triangles` enumeration with each
    triangle credited to its three edges. Returns ``(a, b, support)``
    covering every input edge (support 0 when triangle-free)."""
    _deg, tri = _oriented_triangles(cur)
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
                ),
                F.struct(
                    F.least("u", "x").alias("a"), F.greatest("u", "x").alias("b")
                ),
                F.struct(F.col("v").alias("a"), F.col("x").alias("b")),
            )
        ).alias("e")
    ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    support = tri_edges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return cur.join(support, on=["a", "b"], how="left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def ktruss(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
) -> DataFrame:
    """Bounded-iteration k-truss peeling (Cohen 2008): repeatedly drop
    edges supported by fewer than ``k-2`` triangles — the standard
    cohesive-subgraph refinement one notch stronger than k-core (every
    surviving edge sits in ``k-2`` triangles *within the truss*).

    Like :func:`label_propagation`/:func:`bfs_profile`, the iteration
    count is FIXED (``rounds``) so the release is deterministic and
    oracle-replayable as unrolled rounds; real-world trusses converge in
    a handful of peels (each round removes the entire current
    under-supported frontier). Returns the surviving canonical edges
    with their support after a FINAL recount on the surviving set:
    ``(a, b, support)`` — all integer, hash-exact.

    Physical strategy per round (:func:`_edge_support`): the
    :func:`triangle_count` Suri-Vassilvitskii orientation on the CURRENT
    edge set (recomputed — degrees change as edges drop), each triangle
    credited to its three EDGES via one explode, one (edge) count
    shuffle, then the support-threshold filter. Wedge fan-out stays
    O(sqrt(|E|)); shuffles carry id pairs only. Rounds are materialized
    with eager localCheckpoints (see the in-body comment: plan growth,
    not data, is the hazard here).
    """
    # lineage MUST be truncated per round (localCheckpoint, not persist):
    # _edge_support references the edge relation ~6 times (degree union,
    # two degree joins, wedge self-join, support join-back), so a lazy
    # or merely-cached chain grows the LOGICAL plan ~6^rounds — the
    # analyzer itself OOMs long before any data moves. Checkpointed
    # blocks are tiny (canonical id pairs) and freed on GC.
    cur = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    min_support = int(k) - 2
    for _ in range(int(rounds)):
        cur = (
            _edge_support(cur)
            .filter(F.col("support") >= min_support)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return _edge_support(cur).localCheckpoint(eager=True)
