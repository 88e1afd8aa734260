"""Unit tests for the core operators (strategy equivalence, null handling,
predicate compiler errors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdb_spark.operators.dedup import dedup_first_seen, dedup_top_priority
from fastdb_spark.operators.patch import patch_lightcurve
from fastdb_spark.operators.predicates import FieldSpec, apply_where, compile_where


@pytest.fixture()
def versions_df(spark):
    rows = [
        # key (1,1): priorities 0,2,1 -> pick p=2 (val=b)
        (1, 1, 0, "a"),
        (1, 1, 2, "b"),
        (1, 1, 1, "c"),
        # key (1,2): single row
        (1, 2, 0, "d"),
        # key (2,1): tie on priority -> tiebreak on val
        (2, 1, 1, "x"),
        (2, 1, 1, "y"),
    ]
    return spark.createDataFrame(rows, ["k1", "k2", "priority", "val"])


def test_dedup_strategies_agree(versions_df):
    a = dedup_top_priority(versions_df, ["k1", "k2"], ["priority", "val"], "agg")
    w = dedup_top_priority(versions_df, ["k1", "k2"], ["priority", "val"], "window")
    ra = {(r["k1"], r["k2"]): r["val"] for r in a.collect()}
    rw = {(r["k1"], r["k2"]): r["val"] for r in w.collect()}
    assert ra == rw == {(1, 1): "b", (1, 2): "d", (2, 1): "y"}


def test_first_seen_strategies_agree(versions_df):
    a = dedup_first_seen(versions_df, ["k1", "k2"], ["priority", "val"], "agg")
    w = dedup_first_seen(versions_df, ["k1", "k2"], ["priority", "val"], "window")
    ra = {(r["k1"], r["k2"]): r["val"] for r in a.collect()}
    rw = {(r["k1"], r["k2"]): r["val"] for r in w.collect()}
    assert ra == rw == {(1, 1): "a", (1, 2): "d", (2, 1): "x"}


def test_dedup_narrow_strategy(versions_df):
    a = dedup_top_priority(versions_df, ["k1", "k2"], ["priority", "val"], "agg")
    n = dedup_top_priority(versions_df, ["k1", "k2"], ["priority", "val"], "narrow")
    ra = {(r["k1"], r["k2"]): r["val"] for r in a.collect()}
    rn = {(r["k1"], r["k2"]): r["val"] for r in n.collect()}
    assert ra == rn
    with pytest.raises(ValueError):
        dedup_top_priority(
            versions_df, ["k1"], [F.col("priority") * 2], "narrow"
        )  # expression ordering not allowed for narrow


def test_dedup_expression_ordering(versions_df):
    # Column-expression ordering (e.g. negated priority) works
    out = dedup_top_priority(
        versions_df, ["k1", "k2"], [-F.col("priority"), F.col("val")]
    )
    got = {(r["k1"], r["k2"]): r["val"] for r in out.collect()}
    assert got[(1, 1)] == "a"  # lowest priority wins under negation


def test_patch_row_level_preference(spark):
    """Forced row wins wholesale even when its value is NULL (reference
    CASE WHEN f.rootid IS NULL THEN s.x ELSE f.x END semantics)."""
    forced = spark.createDataFrame(
        [(1, 10, None), (1, 11, 5.0)], ["rootid", "visit", "flux"]
    )
    sources = spark.createDataFrame(
        [(1, 10, 99.0), (1, 12, 7.0)], ["rootid", "visit", "flux"]
    )
    out = {
        (r["rootid"], r["visit"]): r
        for r in patch_lightcurve(forced, sources, ("rootid", "visit"), ["flux"]).collect()
    }
    assert out[(1, 10)]["flux"] is None  # forced NULL wins over source 99.0
    assert out[(1, 10)]["isdet"] and not out[(1, 10)]["ispatch"]
    assert out[(1, 11)]["flux"] == 5.0 and not out[(1, 11)]["isdet"]
    assert out[(1, 12)]["flux"] == 7.0 and out[(1, 12)]["ispatch"]


def test_predicate_compiler_surface(spark):
    specs = {
        "a": FieldSpec(mult=True),
        "b": FieldSpec(substr=True),
        "c": FieldSpec(minmax=True),
        "d": FieldSpec(minmax=True),
    }
    df = spark.createDataFrame(
        [(1, "foo", 10, 3), (2, "bar", 20, 30), (1, "foobar", 30, 3)],
        ["a", "b", "c", "d"],
    )
    got = apply_where(
        df, specs, {"a": [1], "b": ["foo"], "c_min": 5, "c_max": 30}
    ).collect()
    assert {(r["a"], r["b"]) for r in got} == {(1, "foo"), (1, "foobar")}

    # cross-field difference: c - d >= 20
    got2 = apply_where(df, specs, {"c_minus_d_min": 20}).collect()
    assert {r["c"] for r in got2} == {30} if len(got2) == 1 else True
    assert len(got2) == 1

    with pytest.raises(ValueError):
        compile_where(specs, {"nope": 1})
    with pytest.raises(ValueError):
        compile_where(specs, {"b": ["x"], "a_min": 1})  # a is not minmax
    with pytest.raises(ValueError):
        compile_where({"a": FieldSpec()}, {"a": [1, 2]})  # list without mult


def test_compile_where_none_when_empty():
    assert compile_where({"a": FieldSpec()}, {}) is None
    assert compile_where({"a": FieldSpec()}, {"a": None}) is None
