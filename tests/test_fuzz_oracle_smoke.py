"""Smoke the randomized-fixture oracle fuzzer (tools/fuzz_oracle.py).

The full 20-seed x 75-op sweep runs out-of-band (artifact
FUZZ_ORACLE.json); this keeps the MACHINERY honest in CI: one seed,
a cheap op subset, zero divergences expected — so a regression in the
perturbation code or in any of the r10 NULL/degenerate-edge fixes
fails the suite, not just the next manual sweep.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SMOKE_OPS = [
    "x108_ks_test",
    "x80_mann_whitney",
    "x229_anderson_darling",
    "x204_cramers_v",
    "x110_anova",
    "x74_ab_test",
    "x01_dp_quantile_exact",
    "x46_dp_distinct_exact",
    "x209_odds_ratio",
    "x111_gini",
]

SMOKE_SEED = 1042  # outside the committed 1..20 sweep range


def test_one_fuzz_seed_runs_clean(spark):
    import __spark_entry__ as em
    from check_oracle import compare, duck_con
    from fuzz_oracle import build_fuzz_dir

    qs, oracles = em.queries(), em.oracle_sql()
    d = build_fuzz_dir(SMOKE_SEED)
    con = duck_con(d)
    failures = []
    for name in SMOKE_OPS:
        try:
            sp = qs[name](spark, d).toPandas()
            du = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"))
            continue
        problems = compare(name, sp, du)
        if problems:
            failures.append((name, "; ".join(problems)))
    con.close()
    assert not failures, failures


def test_perturbation_is_seed_deterministic(tmp_path):
    """Same seed => byte-identical fuzz tables (the committed-seed
    reproducibility claim the artifact rests on)."""
    import numpy as np

    from fuzz_oracle import perturb_table

    src = "/root/testdata/sf0.001/events.parquet"
    a, b = tmp_path / "a.parquet", tmp_path / "b.parquet"
    perturb_table("events", src, str(a), np.random.RandomState(7))
    perturb_table("events", src, str(b), np.random.RandomState(7))
    assert a.read_bytes() == b.read_bytes()


def test_key_tables_never_duplicate_ids(tmp_path):
    import numpy as np
    import pyarrow.dataset as ds

    from fuzz_oracle import perturb_table

    for seed in (1, 5, 9):
        out = tmp_path / f"docs{seed}.parquet"
        perturb_table(
            "documents",
            "/root/testdata/sf0.001/documents.parquet",
            str(out),
            np.random.RandomState(seed),
        )
        ids = [r["doc_id"] for r in ds.dataset(str(out)).to_table().to_pylist()]
        assert len(ids) == len(set(ids)), f"seed {seed} duplicated doc_id"
