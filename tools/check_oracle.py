"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir on
Spark AND the matching ``oracle_sql()`` on DuckDB, then compares
row-count, column names, and order-insensitive values (exact for
non-floats, equality-after-canonicalization for floats). Queries without
an oracle get a rows-only smoke run.

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query_name ...]

``--json`` additionally writes a CORRECTNESS-shaped artifact (the
driver's per-query row schema: rows/schema/hash match + err) so local
sweeps can be committed as supplementary evidence. Do NOT name such
artifacts ``CORRECTNESS_r<N>.json`` — that glob is the DRIVER-green
ledger (tests/test_registry_window.py) and local sweeps must not count
as driver confirmations.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        # the driver's value-hash is representation-sensitive: an int64
        # column on one engine vs float64/HUGEINT-backed-object on the
        # other hashes differently even when values compare equal (the
        # r2 x09_json_props lesson) — surface dtype divergence explicitly
        s_kind, d_kind = s[c].dtype.kind, d[c].dtype.kind
        if s_kind != d_kind and {s_kind, d_kind} != {"O"}:
            problems.append(
                f"col {c}: dtype kind spark={s[c].dtype} duck={d[c].dtype} "
                "(driver hash may mismatch even if values are equal)"
            )
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            sv = np.asarray(sv, dtype=float)
            dv = np.asarray(dv, dtype=float)
            bad = ~(np.isclose(sv, dv, rtol=0, atol=0, equal_nan=True))
            if bad.any():
                exact_bad = int(bad.sum())
                close = np.isclose(sv, dv, rtol=1e-9, atol=1e-12, equal_nan=True)
                problems.append(
                    f"col {c}: {exact_bad} values differ exactly "
                    f"(within 1e-9: {int((~close).sum())} still differ; "
                    f"max abs diff {np.nanmax(np.abs(sv - dv)):.3e})"
                )
        else:
            # both-null counts as equal (NaT != NaT elementwise in numpy)
            eq = (sv == dv) | (pd.isna(sv) & pd.isna(dv))
            if not eq.all():
                n_bad = int((~eq).sum())
                i = int(np.argmax(~eq))
                problems.append(f"col {c}: {n_bad} values differ (e.g. {sv[i]!r} vs {dv[i]!r})")
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from dbms_data_anonymity_differential_privacy_spark import get_spark

    spark = get_spark()
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None, "err": f"spark: {e}",
            }
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows ({time.time() - t0:.1f}s)")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(spark_pdf), "oracle_rows": None, "err": None,
                "rows_only": True,
            }
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(spark_pdf), "oracle_rows": None,
                "err": f"duckdb: {e}",
            }
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        report[name] = {
            "rows_match": len(spark_pdf) == len(duck_pdf),
            "schema_match": sorted(spark_pdf.columns) == sorted(duck_pdf.columns),
            "hash_match": not problems,
            "spark_rows": len(spark_pdf),
            "oracle_rows": len(duck_pdf),
            "err": "; ".join(problems) or None,
        }
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time() - t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows hash-match ({time.time() - t0:.1f}s)")
    print(f"\n{len(qs)} queries, {failures} failures")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": report}, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
