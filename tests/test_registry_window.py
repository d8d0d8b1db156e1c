"""Guard the driver's 50-query correctness window.

The driver hash-checks only the first 50 registered queries per round.
Since round 7 the rotation policy is BY STALENESS: new debuts and
output/plan-changed queries take the first slots, the rest go to the
least-recently-driver-checked oracle queries. These tests fail loudly
if a future registration pushes an oracle-backed query out of the
window without a driver-green row, or lets any query's newest driver
confirmation grow older than MAX_STALENESS rounds.

The driver-green ledger is read from the committed CORRECTNESS_r*.json
artifacts (the driver's own reports), so it never drifts from reality
and needs no per-round hand maintenance. No Spark session needed —
pure registration-order checks.
"""

from __future__ import annotations

import json
from pathlib import Path

from dbms_data_anonymity_differential_privacy_spark.queries_registry import (
    _WINDOW_R8,
    ORACLE_SQL,
    QUERIES,
)

WINDOW = 50
MAX_STALENESS = 5  # rounds since the newest driver-green row
ROOT = Path(__file__).resolve().parent.parent


def _green_by_round() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        data = json.loads(f.read_text())
        out[rnd] = {
            name
            for name, row in data.items()
            if isinstance(row, dict) and row.get("hash_match")
        }
    return out


GREEN_BY_ROUND = _green_by_round()
# Union ledger: a query may rotate out of the window ONLY if it holds a
# driver-issued green row from SOME prior round.
DRIVER_GREEN_PRIOR = set().union(*GREEN_BY_ROUND.values())
# The round whose driver run the CURRENT window feeds.
CURRENT_ROUND = max(GREEN_BY_ROUND) + 1

# Oracle-backed queries registered this round that debut OUTSIDE the
# window (only allowed when every window slot holds a query still
# awaiting its first driver row or a deliberate re-check). Round 8:
# empty — the window's 50 slots hold the 4 r8 debuts (all in-window),
# the 32 session-3 debuts that were waiting here last round, and the
# 14 round-2-stale queries from the failing r7 staleness assertion.
NEW_THIS_ROUND: set[str] = set()


def component_of(name: str) -> str:
    return name.split("_", 1)[0]


def test_ledger_artifacts_exist():
    assert len(GREEN_BY_ROUND) >= 6, "driver CORRECTNESS artifacts missing"
    assert all(GREEN_BY_ROUND.values()), "a round with zero green rows"


def test_window_is_all_oracle_backed():
    inside = list(QUERIES)[:WINDOW]
    missing = [n for n in inside if n not in ORACLE_SQL]
    assert not missing, f"rows-only queries waste the driver window: {missing}"


def test_window_list_matches_registration():
    """_WINDOW_R8 IS the window: every listed name registered, exactly 50,
    occupying the first 50 slots in order."""
    assert len(_WINDOW_R8) == WINDOW
    assert len(set(_WINDOW_R8)) == WINDOW
    unregistered = [n for n in _WINDOW_R8 if n not in QUERIES]
    assert not unregistered, f"window names not registered: {unregistered}"
    assert list(QUERIES)[:WINDOW] == _WINDOW_R8


def test_every_oracle_component_has_driver_signal():
    """Every component with an oracle either sits in this round's window or
    is fully covered by prior driver-green rows (rotation ledger)."""
    inside = {component_of(n) for n in list(QUERIES)[:WINDOW]}
    unsignalled = [
        n
        for n in QUERIES
        if n in ORACLE_SQL
        and component_of(n) not in inside
        and n not in DRIVER_GREEN_PRIOR
        and n not in NEW_THIS_ROUND
    ]
    assert not unsignalled, (
        f"oracle queries with neither an in-window component nor a prior "
        f"driver-green row: {unsignalled}"
    )


def test_rotated_out_queries_were_driver_green():
    """Nothing rotates out of the window without a driver-issued green row:
    the union of rounds must keep every oracle-backed query checked."""
    inside = set(list(QUERIES)[:WINDOW])
    unchecked = [
        n for n in QUERIES
        if n in ORACLE_SQL
        and n not in inside
        and n not in DRIVER_GREEN_PRIOR
        and n not in NEW_THIS_ROUND
    ]
    assert not unchecked, f"oracle queries that never got a driver row: {unchecked}"


def test_window_rotates_by_staleness():
    """The r6-verdict staleness contract: every oracle-backed query is
    either in the current window or its newest driver-green row is at
    most MAX_STALENESS rounds old. Keeps the rotation honest — a query
    cannot silently coast on a years-old confirmation."""
    inside = set(list(QUERIES)[:WINDOW])
    last: dict[str, int] = {}
    for rnd in sorted(GREEN_BY_ROUND):
        for n in GREEN_BY_ROUND[rnd]:
            last[n] = rnd
    too_stale = [
        (n, last.get(n))
        for n in QUERIES
        if n in ORACLE_SQL
        and n not in inside
        and n not in NEW_THIS_ROUND
        and CURRENT_ROUND - last.get(n, 0) > MAX_STALENESS
    ]
    assert not too_stale, (
        f"queries outside the window whose driver confirmation is older "
        f"than {MAX_STALENESS} rounds: {too_stale}"
    )


def test_rows_only_queries_registered_last():
    names = list(QUERIES)
    first_rows_only = next((i for i, n in enumerate(names) if n not in ORACLE_SQL), len(names))
    assert all(n not in ORACLE_SQL for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only query"
    )


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's headline surface counts must track the registry —
    stale counts were a round-3 verdict finding; this pins them.
    (Dropped by mistake in the round-7 rewrite of this module and
    restored after an independent review caught the regression.)"""
    import pathlib
    import re

    text = pathlib.Path(__file__).parent.parent.joinpath("COVERAGE.md").read_text()
    m = re.search(
        r"the full (\d+)-query oracle surface — (\d+)\s*\nregistered queries, (\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md headline count sentence not found"
    n_oracle, n_registered, n_rows_only = map(int, m.groups())
    assert n_oracle == len(ORACLE_SQL), (n_oracle, len(ORACLE_SQL))
    assert n_registered == len(QUERIES), (n_registered, len(QUERIES))
    assert n_rows_only == len(QUERIES) - len(ORACLE_SQL)


def test_bench_headline_names_registered():
    """Every bench.py HEADLINE name must be a registered query — a typo
    here would crash the driver's per-round bench run."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench HEADLINE names not registered: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
