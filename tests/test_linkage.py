"""Record-linkage invariants (operators/linkage.py)."""

from __future__ import annotations

from dbms_data_anonymity_differential_privacy_spark.operators.kanonymity import (
    k_anonymize_suppress,
)
from dbms_data_anonymity_differential_privacy_spark.operators.linkage import (
    fuzzy_pairs,
    fuzzy_pairs_fastss,
    linkage_attack_audit,
)


def test_fuzzy_pairs_finds_typos_within_blocks(spark):
    df = spark.createDataFrame(
        [
            (1, "jonathan smith"),
            (2, "jonathan smyth"),  # dist 1 from 1
            (3, "jonathan smithe"),  # dist 1 from 1, 2 from 2
            (4, "jonathan brown"),  # dist > 2 from all
            (5, "ronathan smith"),  # dist 1 from 1 but DIFFERENT block (prefix)
        ],
        "id long, name string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "name", "id", max_dist=2, block_prefix=4).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert pairs[(2, 3)] == 2
    assert not any(4 in p for p in pairs)
    # blocking is a recall trade: the cross-block typo is missed by design
    assert not any(5 in p for p in pairs)


def test_fuzzy_pairs_emits_each_pair_once(spark):
    df = spark.createDataFrame(
        [(i, f"name{i:03d}") for i in range(20)], "id long, name string"
    )
    rows = fuzzy_pairs(df, "name", "id", max_dist=1, block_prefix=4).collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert len({(r["id_a"], r["id_b"]) for r in rows}) == len(rows)


def test_linkage_audit_certifies_k_anonymity(spark, sf0001):
    from dbms_data_anonymity_differential_privacy_spark import load_table
    from dbms_data_anonymity_differential_privacy_spark.queries_registry import binned_customer

    b = binned_customer(spark, sf0001)
    qi = ["c_nationkey", "c_mktsegment", "acctbal_bin"]
    # the raw table linked against itself: singleton classes exist and
    # are re-identified outright
    raw = linkage_attack_audit(b, b, qi).collect()[0]
    assert raw["min_candidates"] == 1
    assert raw["n_reidentified"] > 0
    # the k=5 release linked against the FULL original as auxiliary:
    # the attack finds >= 5 candidates for every row, zero re-identified
    # (2-col QI, the flagship's: the 3-col QI suppresses ~100% of the
    # 150-row sf0.001 table and the audit of an empty release is vacuous)
    qi = ["c_mktsegment", "acctbal_bin"]
    released = k_anonymize_suppress(b, qi, 5)
    audited = linkage_attack_audit(released, b, qi).collect()[0]
    assert audited["n_released"] == released.count()
    assert audited["min_candidates"] >= 5
    assert audited["n_reidentified"] == 0
    assert 0.0 < audited["avg_risk"] <= 1.0 / 5


def test_linkage_audit_no_match_rows_carry_zero_risk(spark):
    rel = spark.createDataFrame([(1, "a"), (2, "b")], "id long, q string")
    aux = spark.createDataFrame([(9, "a")], "id long, q string")
    r = linkage_attack_audit(rel, aux, ["q"]).collect()[0]
    assert r["n_released"] == 2
    assert r["n_reidentified"] == 1  # 'a' links to exactly one aux row
    assert r["avg_risk"] == 0.5  # (1/1 + 0)/2


def test_fastss_matches_brute_force_and_beats_blocking(spark):
    """FastSS is EXACT for dist <= 1: equals brute force on a corpus with
    substitutions, inserts, deletes, exact dups, AND a pair that differs
    in the blocking prefix (which fuzzy_pairs' prefix blocking misses)."""
    from itertools import combinations

    names = [
        (1, "jonathan smith"),
        (2, "jonathan smyth"),   # substitution
        (3, "jonathan smiths"),  # insertion
        (4, "jonathan smit"),    # deletion
        (5, "jonathan smith"),   # exact duplicate (dist 0)
        (6, "ronathan smith"),   # first-char substitution (cross-prefix)
        (7, "maria garcia"),
        (8, "nothing alike"),
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs_fastss(df, "name", "id").collect()
    }

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[-1]

    want = {
        (i, j): lev(a, b)
        for (i, a), (j, b) in combinations(names, 2)
        if lev(a, b) <= 1
    }
    assert got == want
    # the cross-prefix pair (1, 6) is present — full recall
    assert (1, 6) in got
    # ... and prefix blocking would have missed it
    blocked = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(df, "name", "id", max_dist=1, block_prefix=4).collect()
    }
    assert (1, 6) not in blocked


def test_fastss_shared_variant_at_distance_two_is_rejected(spark):
    """'ab' and 'ba' share deletion variants {'a','b'} but are distance 2 —
    the verification step must reject them."""
    df = spark.createDataFrame([(1, "ab"), (2, "ba")], "id long, name string")
    assert fuzzy_pairs_fastss(df, "name", "id").collect() == []


def test_resolve_entities_crafted(spark):
    """X103: a transitive lev-1 chain merges into one entity labeled and
    canonicalized by its minimum id; non-matching records stay singleton;
    record mass is conserved."""
    from dbms_data_anonymity_differential_privacy_spark.operators.linkage import resolve_entities

    df = spark.createDataFrame(
        [
            (10, "smith"),
            (11, "smyth"),    # lev 1 from smith
            (12, "smythe"),   # lev 1 from smyth, lev 2 from smith -> chains in
            (20, "jones"),
            (30, "garcia"),
        ],
        "id long, name string",
    )
    out = {r.entity_id: r for r in resolve_entities(df, "name", "id").collect()}
    assert set(out) == {10, 20, 30}
    assert out[10].n_records == 3 and out[10].canonical_value == "smith"
    assert out[20].n_records == 1 and out[20].canonical_value == "jones"
    assert sum(r.n_records for r in out.values()) == 5


def test_resolve_entities_distance_guard(spark):
    import pytest

    from dbms_data_anonymity_differential_privacy_spark.operators.linkage import resolve_entities

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(NotImplementedError):
        resolve_entities(df, "name", "id", max_distance=2)
