"""Record linkage — fuzzy matching and linkage-attack auditing.

Two sides of the same coin for a privacy engine:

- **Entity resolution** (:func:`fuzzy_pairs`): find records that refer to
  the same entity despite typos/formatting — the dedup problem for
  STRUCTURED identity data, where shingle/MinHash machinery (built for
  prose) is the wrong tool and edit distance is the standard one.
- **Linkage-attack audit** (:func:`linkage_attack_audit`): the classic
  re-identification vector (Sweeney 2000 — 87% of the US population is
  unique on ZIP+birthdate+sex). Given a released (anonymized) relation
  and an auxiliary/public relation, count how many auxiliary candidates
  each released row links to on the quasi-identifiers; rows with exactly
  one candidate are re-identified outright. Auditing a k-anonymized
  release against the ORIGINAL table as the worst-case auxiliary must
  show min candidates >= k — the k-anonymity guarantee restated as an
  attack, which makes it an end-to-end check of the whole anonymization
  path (pinned in tests).

Scale shape: never all-pairs. :func:`fuzzy_pairs` joins on a BLOCKING
key (prefix + length band by default) so the quadratic term is bounded
per block — the standard ER design; skewed blocks get the same
AQE-skew/salting treatment as any hot join key. ``levenshtein`` is a
built-in on both engines (identical unit-cost definition), so the whole
operator is JVM-side and DuckDB-oracle-checkable. The audit is one
group-count on the auxiliary side + one broadcast-friendly equi-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_dist: int = 2,
    block_prefix: int = 4,
    length_band: int | None = None,
) -> DataFrame:
    """Within-relation fuzzy duplicate pairs: ``(id_a, id_b, dist)`` with
    ``id_a < id_b`` and ``levenshtein <= max_dist``.

    Blocking: candidates must share the first ``block_prefix`` characters
    (and, with ``length_band``, have lengths within that band — a sound
    filter since edit distance >= length difference). With unit edit
    costs, two strings differing in their first ``block_prefix`` chars
    CAN still be within ``max_dist``; prefix blocking is the standard
    recall/cost trade and is documented as such, not sold as exact.
    """
    if length_band is None:
        length_band = max_dist
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(col).alias("__va"),
        F.substring(F.col(col), 1, block_prefix).alias("__blk"),
        F.length(F.col(col)).alias("__la"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(col).alias("__vb"),
        F.substring(F.col(col), 1, block_prefix).alias("__blk"),
        F.length(F.col(col)).alias("__lb"),
    )
    joined = a.join(b, "__blk").where(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("__la") - F.col("__lb")) <= F.lit(length_band))
    )
    return (
        joined.withColumn("dist", F.levenshtein(F.col("__va"), F.col("__vb")))
        .where(F.col("dist") <= F.lit(max_dist))
        .select("id_a", "id_b", "dist")
    )


def fuzzy_pairs_fastss(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Exact ``levenshtein <= 1`` duplicate pairs via FastSS deletion
    neighborhoods (Bocek et al., U. Zurich TR 2007) — the scale path that
    replaces per-block quadratic scans.

    Two strings are within edit distance 1 **iff** their deletion
    neighborhoods ``{s} ∪ {s minus one char}`` intersect (sharing a
    variant can also mean distance 2 — e.g. "ab"/"ba" — so candidates are
    verified with one levenshtein each). Unlike prefix blocking this has
    FULL recall: no near-pair can disagree only inside a blocking key.

    Physical shape (the engine's near-dup idiom, `dedup.py`): each row
    explodes to ``len+1`` 8-byte variant HASHES — strings never shuffle —
    candidates come from a self-equi-join on the hash, are deduped as id
    pairs, and re-attach their values for verification. Cost is
    candidate-bound (near-duplicate mass), not block-size-bound: a
    million rows sharing a 15-char prefix cost nothing unless they
    actually collide on a variant. Hash collisions only ever ADD
    candidates, which verification then rejects.
    """
    s = df.select(F.col(id_col).alias("id"), F.col(col).alias("v"))
    # variants: i in [0, len) deletes char i+1; i = len yields v itself
    ex = s.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(0, length(v)), "
                "i -> xxhash64(concat(substring(v, 1, i), "
                "substring(v, i + 2, 2147483647))))"
            )
        ).alias("__h"),
    )
    cand = (
        ex.alias("a")
        .join(ex.alias("b"), "__h")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(s.select(F.col("id").alias("id_a"), F.col("v").alias("__va")), "id_a")
        .join(s.select(F.col("id").alias("id_b"), F.col("v").alias("__vb")), "id_b")
        .withColumn("dist", F.levenshtein(F.col("__va"), F.col("__vb")))
        .where(F.col("dist") <= F.lit(1))
        .select("id_a", "id_b", "dist")
    )


def fuzzy_pairs_sql(
    table: str,
    col: str,
    id_col: str,
    max_dist: int = 2,
    block_prefix: int = 4,
    length_band: int | None = None,
) -> str:
    """DuckDB twin of :func:`fuzzy_pairs` (same blocking, same built-in
    unit-cost levenshtein)."""
    if length_band is None:
        length_band = max_dist
    return f"""
    WITH s AS (SELECT {id_col} AS id, {col} AS v,
                      substr({col}, 1, {block_prefix}) AS blk,
                      length({col}) AS l
               FROM {table})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.v, b.v) AS INT) AS dist
    FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
         AND abs(a.l - b.l) <= {length_band}
    WHERE levenshtein(a.v, b.v) <= {max_dist}
    """


def linkage_attack_audit(
    released: DataFrame,
    auxiliary: DataFrame,
    qi: Sequence[str],
) -> DataFrame:
    """Single-row audit of a released relation against an auxiliary one:
    for each released row, how many auxiliary rows share its QI tuple?

    Output columns: ``n_released``, ``n_reidentified`` (exactly one
    candidate — outright re-identification), ``min_candidates``
    (worst-case protection; >= k certifies k-anonymity against this
    auxiliary), ``avg_risk`` (mean of 1/candidates, the expected fraction
    an attacker links correctly by guessing uniformly).

    Plan: ONE aggregation of the auxiliary to (qi, candidates) + an
    equi-join of released rows onto it — the candidate relation has at
    most one row per QI class, so at 100 TB it is the small side and
    broadcasts (or AQE decides). Released rows with NO auxiliary match
    carry zero risk and count toward ``n_released`` only.
    """
    cand = auxiliary.groupBy(*qi).agg(F.count(F.lit(1)).alias("__cand"))
    joined = released.join(cand, list(qi), "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_released"),
        F.sum((F.col("__cand") == 1).cast("long")).alias("n_reidentified"),
        F.min("__cand").alias("min_candidates"),
        F.round(
            F.avg(F.when(F.col("__cand").isNotNull(), 1.0 / F.col("__cand")).otherwise(0.0)),
            9,
        ).alias("avg_risk"),
    )


def resolve_entities(
    df: DataFrame,
    value_col: str,
    id_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """X103 — entity resolution: fuzzy duplicate records collapse into
    entities with a canonical representative.

    The composite every master-data / customer-360 pipeline runs:
    (1) candidate matching — FastSS deletion-neighborhood pairs within
    levenshtein ``max_distance`` (exact, full recall; the X31 operator,
    candidate-bound not block-bound); (2) transitive closure — the
    bounded-iteration min-label propagation of X3's corpus dedup (ids
    only ever shuffle); (3) canonical selection — the entity label IS
    the minimum member id, so the representative lookup is a filter
    (``id == entity_id``), not an argmin pass.

    Records whose value matches nothing form singleton entities (their
    own id). Output: ``(entity_id, n_records, canonical_value)`` — one
    row per entity; ``sum(n_records)`` always equals the input rowcount
    (pinned in tests).

    Scale: the only fact-row pass is the slim (id, value) projection;
    pairs and labels are id-relations; the closure converges in
    O(component diameter) rounds (duplicate clusters are shallow).
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import connected_components

    if max_distance != 1:
        raise NotImplementedError(
            "FastSS neighborhood generation is implemented for distance 1 "
            "(deletion variants); use fuzzy_pairs() blocking for larger radii"
        )
    pairs = fuzzy_pairs_fastss(df, value_col, id_col)
    comp = connected_components(pairs.select("id_a", "id_b"), shortcut=True)
    ids = df.select(F.col(id_col).alias("id"), F.col(value_col).alias("__v"))
    labeled = ids.join(comp, "id", "left").select(
        "id", "__v", F.coalesce("comp", F.col("id")).alias("entity_id")
    )
    ents = labeled.groupBy("entity_id").agg(F.count(F.lit(1)).alias("n_records"))
    canon = labeled.where(F.col("id") == F.col("entity_id")).select(
        "entity_id", F.col("__v").alias("canonical_value")
    )
    return ents.join(canon, "entity_id").select(
        "entity_id", "n_records", "canonical_value"
    )
