"""Round-15 pins for the batched cogroup rewrite (VERDICT r14 item 3):
udf_cogrouped_reconcile moved off the fixed 1024-bucket
``cogroup(...).applyInPandas`` dispatch onto
operators/joins.py::cogroup_apply_batched (tagged union +
hash-shuffle-once + core/keyruns whole-run walk — the asof-join
shape). These tests pin

- NATIVE-API EQUIVALENCE: the registered row's output equals a
  straight ``groupBy(k).cogroup(groupBy(k)).applyInPandas`` per-key
  run of the same reconcile logic — so the batched walk is a
  drop-in replacement for the fourth pandas-UDF family, and the
  native API itself stays exercised here;
- the generic operator's contract corners: left-only keys (empty
  right slice), right-only keys (fn decides — here they drop),
  column-collision / reserved-name rejection.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mapreduceframework_spark.operators.joins import cogroup_apply_batched
from mapreduceframework_spark.plans.registry import REGISTRY
from mapreduceframework_spark.sources import load_table

import mapreduceframework_spark.plans.udf_queries  # noqa: F401


def test_matches_native_cogroup_api(spark, sf_dir):
    def per_key(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame):
        if len(lines_pdf):
            g = lines_pdf.assign(
                disc=(lines_pdf["l_discount"] > 0).astype("int64")
            ).groupby("l_orderkey")
            stats = pd.DataFrame(
                {
                    "n_lines": g.size(),
                    "last_ship_us": g["l_shipdate"]
                    .max()
                    .astype("datetime64[us]")
                    .astype("int64"),
                    "n_discounted": g["disc"].sum(),
                }
            )
        else:
            stats = pd.DataFrame(
                columns=["n_lines", "last_ship_us", "n_discounted"]
            )
        out = orders_pdf[["o_orderkey"]].join(
            stats, on="o_orderkey", how="left"
        )
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        out["n_discounted"] = out["n_discounted"].fillna(0).astype("int64")
        return out

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_discount"
    )
    native = (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(
            per_key,
            "o_orderkey long, n_lines long, last_ship_us long, "
            "n_discounted long",
        )
        .collect()
    )
    want = {
        r["o_orderkey"]: (r["n_lines"], r["last_ship_us"], r["n_discounted"])
        for r in native
    }
    got_rows = REGISTRY["udf_cogrouped_reconcile"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (r["n_lines"], r["last_ship_us"], r["n_discounted"])
        for r in got_rows
    }
    assert got == want
    assert len(got_rows) == len(native)  # no dup / dropped keys


def test_one_sided_keys(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (5, "e")], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 10), (1, 11), (3, 30)], "k long, rv long"
    )

    def fn(ldf: pd.DataFrame, rdf: pd.DataFrame):
        # inner-ish: emit left keys with their right-row count;
        # right-only keys (3) drop because we join FROM the left side.
        cnt = rdf.groupby("_k").size()
        out = ldf[["_k"]].drop_duplicates().join(cnt.rename("n"), on="_k")
        out["k"] = out["_k"].astype("int64")
        out["n"] = out["n"].fillna(0).astype("int64")
        return out[["k", "n"]]

    got = {
        r["k"]: r["n"]
        for r in cogroup_apply_batched(
            left.select("k"), right, "k", "k", fn, "k long, n long"
        ).collect()
    }
    assert got == {1: 2, 2: 0, 5: 0}


def test_rejects_collisions(spark):
    a = spark.createDataFrame([(1, 2)], "k long, v long")
    b = spark.createDataFrame([(1, 3)], "k long, v long")
    with pytest.raises(ValueError, match="collision"):
        cogroup_apply_batched(a, b, "k", "k", lambda l_, r_: None, "k long")
    c = spark.createDataFrame([(1, 2)], "k long, _side long")
    with pytest.raises(ValueError, match="collision"):
        cogroup_apply_batched(
            c, b.select("k"), "k", "k", lambda l_, r_: None, "k long"
        )
