"""Registry / driver-contract hygiene — fast meta-checks that protect
the round driver's assumptions without running any Spark job:

- every oracle is parseable DuckDB SQL (EXPLAIN, not execute — catches
  syntax drift in seconds instead of the full parity run's minutes);
- the driver window is exactly the first 50 registry entries;
- __spark_entry__ exposes exactly the registry (the driver imports it,
  not the registry, so a drift here silently shrinks coverage);
- naming and metadata invariants the tooling relies on.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from mapreduceframework_spark.plans.registry import DRIVER_WINDOW, all_queries
from mapreduceframework_spark.sources.registry import TABLES

REG = all_queries()


@pytest.fixture(scope="module")
def lint_con(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(n for n in REG if REG[n].oracle))
def test_oracle_sql_parses_and_plans(lint_con, name):
    # EXPLAIN forces full parse + bind against the real schemas without
    # executing — a renamed column or SQL typo fails here in
    # milliseconds.
    lint_con.execute(f"EXPLAIN {REG[name].oracle}")


def test_driver_window_is_registry_prefix():
    assert len(DRIVER_WINDOW) == 50
    assert list(REG)[:50] == list(DRIVER_WINDOW)
    assert len(set(DRIVER_WINDOW)) == 50


def test_spark_entry_mirrors_registry():
    import __spark_entry__ as entry

    q = entry.queries()
    assert set(q) == set(REG)
    o = entry.oracle_sql()
    assert set(o) == {n for n in REG if REG[n].oracle is not None}
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_registry_metadata_invariants():
    for name, spec in REG.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert spec.tags, f"{name} has no tags"
        assert spec.doc, f"{name} has no docstring"


def test_every_query_has_an_oracle():
    # The engine's standing claim: zero rows-only checks. If a future
    # query genuinely can't be SQL-expressed, this test is the place
    # where that exception gets consciously recorded.
    missing = [n for n in REG if REG[n].oracle is None]
    assert missing == [], missing
