"""Guard the driver's 50-query correctness window.

The driver hash-checks only the first 50 registered queries. These tests
fail loudly if a future registration pushes an oracle-backed query out of
the window or leaves a SURVEY §2 component without an in-window oracle row.
No Spark session needed — pure registration-order checks.
"""

from dbms_data_anonymity_differential_privacy_spark.queries_registry import ORACLE_SQL, QUERIES

WINDOW = 50


def component_of(name: str) -> str:
    return name.split("_", 1)[0]


def test_window_is_all_oracle_backed():
    inside = list(QUERIES)[:WINDOW]
    missing = [n for n in inside if n not in ORACLE_SQL]
    assert not missing, f"rows-only queries waste the driver window: {missing}"


def test_every_oracle_component_represented_in_window():
    inside = {component_of(n) for n in list(QUERIES)[:WINDOW]}
    oracle_components = {component_of(n) for n in QUERIES if n in ORACLE_SQL}
    assert oracle_components <= inside, (
        f"components with oracles but no in-window query: {oracle_components - inside}"
    )


def test_rows_only_queries_registered_last():
    names = list(QUERIES)
    first_rows_only = next((i for i, n in enumerate(names) if n not in ORACLE_SQL), len(names))
    assert all(n not in ORACLE_SQL for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only query"
    )
