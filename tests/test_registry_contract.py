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


def test_scoped_sql_conf_is_pinned_per_query(spark, sf_dir):
    """r17: per-query runtime confs (the scoped AQE coalescing floor)
    must be SET when an overriding query builds and RESET to the engine
    default when any other query builds — otherwise one query's
    toy-scale tuning leaks into every later query in the session."""
    from mapreduceframework_spark.plans.registry import (
        _SCOPED_CONF_DEFAULTS,
    )

    key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    rules = "spark.sql.optimizer.excludedRules"
    assert key in _SCOPED_CONF_DEFAULTS and rules in _SCOPED_CONF_DEFAULTS
    overriders = {n for n, s in REG.items() if dict(s.sql_conf).get(key)}
    # The measured r17 A/B winners — update alongside the decorators.
    assert overriders == {
        "dedup_embedding_cosine",
        "dedup_ngram_jaccard",
        "reco_user_similarity",
        "dedup_edit_distance_verify",
        "mining_association_rules",
    }
    nodata = "spark.sql.streaming.noDataMicroBatches.enabled"
    nodata_overriders = {
        n for n, s in REG.items() if dict(s.sql_conf).get(nodata) == "false"
    }
    assert nodata_overriders == {
        "streaming_tumbling_counts",
        "streaming_click_purchase_join",
        "streaming_user_counts_stateful",
        "streaming_dedup_keys",
        "streaming_sliding_avgs",
        "streaming_threshold_alerts",
        "streaming_checkpoint_restart",
    }
    # The outer stream-stream joins MUST keep the trailing no-data
    # batch: without it the watermark never flushes unmatched rows
    # (r17 A/B: left_join emitted 182 of 19842 rows).
    assert "streaming_click_purchase_left_join" not in nodata_overriders
    assert "streaming_click_purchase_full_join" not in nodata_overriders
    rule_overriders = {n for n, s in REG.items() if dict(s.sql_conf).get(rules)}
    assert rule_overriders == {
        "dedup_ngram_jaccard",
        "similarity_join_prefix_filter",
        "decontaminate_ngram_overlap",
        "text_boilerplate_ngrams",
        "text_tfidf_top_terms",
        "text_bpe_vocab_counts",
    }
    for name, spec in REG.items():
        for k in dict(spec.sql_conf):
            assert k in _SCOPED_CONF_DEFAULTS, (name, k)
    # Build (not execute) one overriding and one plain query and watch
    # the session conf flip both ways.
    REG["dedup_ngram_jaccard"].fn(spark, sf_dir)
    assert spark.conf.get(key) == "64k"
    assert "InferFiltersFromGenerate" in spark.conf.get(rules)
    assert "InferFiltersFromConstraints" in spark.conf.get(rules)
    REG["word_counts"].fn(spark, sf_dir)
    assert spark.conf.get(key) == _SCOPED_CONF_DEFAULTS[key]
    assert spark.conf.get(rules) == ""


def test_every_query_has_an_oracle():
    # The engine's standing claim: zero rows-only checks. If a future
    # query genuinely can't be SQL-expressed, this test is the place
    # where that exception gets consciously recorded.
    missing = [n for n in REG if REG[n].oracle is None]
    assert missing == [], missing


# Modules that do NOT count as engine-independent evidence: the generic
# oracle-parity/plan-shape/bench harnesses run EVERY registry row by
# construction (so a name appearing there proves nothing about a
# mirror), and the shared-helper/infra modules aren't tests of a query.
_NON_MIRROR_MODULES = {
    "conftest.py",
    "mirrors.py",
    "test_bench_contract.py",
    "test_data_shape.py",
    "test_mirror_constants.py",
    "test_oracle_parity.py",
    "test_plans.py",
    "test_registry_contract.py",
    "test_session_robustness.py",
    "test_window_planner.py",
}


def test_every_registry_row_has_an_engine_independent_mirror():
    """The round-12 third-opinion program closed with every registry
    row carrying engine-independent evidence (a pure-Python/dict
    reconstruction, a reference golden file, or an independent
    -implementation semantics test). This guard keeps the program
    closed BY CONSTRUCTION (VERDICT r12 item 7): a new registry row
    that no mirror module references by name fails here, so the
    registration and its third opinion must land together.

    The check is necessarily name-reference-level (a module mentioning
    the query name in a non-test string would slip through), but the
    failure mode it guards — forgetting to write any mirror at all —
    is exactly a missing name."""
    import glob
    import os

    here = os.path.dirname(__file__)
    texts = []
    for f in sorted(glob.glob(os.path.join(here, "*.py"))):
        if os.path.basename(f) in _NON_MIRROR_MODULES:
            continue
        with open(f, encoding="utf-8") as fh:
            texts.append(fh.read())
    blob = "\n".join(texts)
    missing = [
        n for n in REG if f'"{n}"' not in blob and f"'{n}'" not in blob
    ]
    assert missing == [], (
        f"registry rows with no engine-independent mirror reference: "
        f"{missing} — write the third opinion before (or with) the "
        f"registration"
    )
