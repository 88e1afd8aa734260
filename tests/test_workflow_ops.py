"""Tests for spectrum workflow, range join, pagination, counts, search."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fastdb_spark import schemas
from fastdb_spark.operators.paginate import paginate, pseudorandom_sample, random_sample
from fastdb_spark.operators.rangejoin import attach_history, collect_history_structs
from fastdb_spark.queries.counts import table_extremes, versioned_count
from fastdb_spark.queries.search import object_search
from fastdb_spark.queries.spectrum import latest_mag_per_band, spectra_wanted
from fastdb_spark.versions import ProcverResolver

from .conftest import ROOT

UTC = dt.timezone.utc


def _t(day: int) -> dt.datetime:
    return dt.datetime(2026, 1, day, tzinfo=UTC)


@pytest.fixture()
def spectrum_tables(spark):
    uid = "00000000-0000-4000-8000-00000000aaaa"
    wanted = [
        # root 0: wanted, never claimed/observed -> stays
        (f"{ROOT[0]} ; alice", ROOT[0], _t(1), uid, "alice", 3, False, 42.0, 13.0),
        # root 1: wanted but planned -> drops
        (f"{ROOT[1]} ; alice", ROOT[1], _t(1), uid, "alice", 2, False, 42.0, 13.0036),
        # root 2: wanted but spectrum reported -> drops
        (f"{ROOT[2]} ; bob", ROOT[2], _t(2), uid, "bob", 5, False, 42.0, 13.0056),
    ]
    planned = [("00000000-0000-4000-8000-00000000bbbb", ROOT[1], "scope1", _t(3), _t(5), None, False)]
    observed = [
        ("00000000-0000-4000-8000-00000000cccc", ROOT[2], "scope2", _t(4), 60040.0,
         0.05, 10, 42.0, 13.0056, False, "SNIa"),
    ]
    return {
        "wantedspectra": spark.createDataFrame(wanted, schemas.WANTEDSPECTRA),
        "plannedspectra": spark.createDataFrame(planned, schemas.PLANNEDSPECTRA),
        "spectruminfo": spark.createDataFrame(observed, schemas.SPECTRUMINFO),
    }


def test_spectra_wanted_anti_chain(spectrum_tables):
    got = spectra_wanted(
        spectrum_tables["wantedspectra"],
        spectrum_tables["plannedspectra"],
        spectrum_tables["spectruminfo"],
    )
    assert {r["root_diaobject_id"] for r in got.collect()} == {ROOT[0]}


def test_spectra_wanted_time_windows(spectrum_tables):
    # claims older than the window no longer block (reference
    # not_claimed_in_last_days semantics)
    got = spectra_wanted(
        spectrum_tables["wantedspectra"],
        spectrum_tables["plannedspectra"],
        spectrum_tables["spectruminfo"],
        not_claimed_in_last_days=7,
        no_spectra_in_last_days=7,
        now=_t(20),  # both the plan (day 3) and spectrum (day 4) have aged out
    )
    assert {r["root_diaobject_id"] for r in got.collect()} == {
        ROOT[0],
        ROOT[1],
        ROOT[2],
    }


def test_spectra_wanted_requester_filter(spectrum_tables):
    got = spectra_wanted(
        spectrum_tables["wantedspectra"],
        spectrum_tables["plannedspectra"],
        spectrum_tables["spectruminfo"],
        requester="bob",
    )
    assert got.count() == 0  # bob's only want (root 2) was observed


def test_attach_history_keeps_empty_probes(spark):
    probe = spark.createDataFrame(
        [(1, 100.0, "a"), (1, 200.0, "b"), (2, 50.0, "c")], ["k", "t", "tag"]
    )
    hist = spark.createDataFrame(
        [(1, 90.0), (1, 150.0), (1, 199.0), (2, 300.0)], ["k", "t"]
    )
    out = {r["tag"]: r["n_prev"] for r in
           attach_history(probe, hist, "k", "t", lookback=50.0).collect()}
    # "a": hist 90 in [50,100) -> 1; "b": 150,199 in [150,200) -> 2;
    # "c": user 2 has only future history -> kept with 0
    assert out == {"a": 1, "b": 2, "c": 0}


def test_asof_latest_semantics(spark):
    from fastdb_spark.operators.rangejoin import asof_latest

    probe = spark.createDataFrame(
        [(1, 100.0, "a"), (1, 200.0, "b"), (2, 50.0, "c")], ["k", "t", "tag"]
    )
    hist = spark.createDataFrame(
        # two rows tied at t=90 for key 1 -> tiebreak picks higher hid;
        # key 2 has only future history -> NULL payloads
        [(1, 90.0, 10, 1.5), (1, 90.0, 11, 2.5), (1, 150.0, 12, 3.5), (2, 300.0, 13, 4.5)],
        ["k", "t", "hid", "val"],
    )
    out = {
        r["tag"]: (r["prev_hid"], r["prev_val"])
        for r in asof_latest(
            probe, hist, key="k", time_col="t",
            payload_cols=["hid", "val"], tiebreak=["hid"],
        ).collect()
    }
    assert out["a"] == (11, 2.5)  # tie at 90 -> max hid wins
    assert out["b"] == (12, 3.5)  # latest strictly before 200
    assert out["c"] == (None, None)  # left semantics


def test_collect_history_structs_sorted(spark):
    probe = spark.createDataFrame([(1, 200.0, "b")], ["k", "t", "tag"])
    hist = spark.createDataFrame(
        [(1, 199.0, 9.0), (1, 150.0, 5.0), (1, 10.0, 1.0)], ["k", "t", "v"]
    )
    rows = collect_history_structs(
        probe, hist, "k", "t", lookback=100.0, gap=0.0, struct_cols=["t", "v"]
    ).collect()
    prv = rows[0]["prv"]
    assert [p["t"] for p in prv] == [150.0, 199.0]  # sorted, 10.0 out of window


def test_paginate_contiguous(spark):
    df = spark.range(0, 103).withColumnRenamed("id", "k")
    p1 = [r["k"] for r in paginate(df, ["k"], 0, 50).collect()]
    p2 = [r["k"] for r in paginate(df, ["k"], 50, 50).collect()]
    p3 = [r["k"] for r in paginate(df, ["k"], 100, 50).collect()]
    assert p1 == list(range(50)) and p2 == list(range(50, 100))
    assert p3 == [100, 101, 102]


def test_samples(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {r["k"] for r in pseudorandom_sample(df, "k", 10, "s").collect()}
    b = {r["k"] for r in pseudorandom_sample(df, "k", 10, "s").collect()}
    c = {r["k"] for r in pseudorandom_sample(df, "k", 10, "other").collect()}
    assert a == b and len(a) == 10
    assert a != c  # different salt, different draw
    assert random_sample(df, 5).count() == 5


def test_versioned_count_golden(golden, golden_pandas):
    resolver = ProcverResolver(
        golden["processing_version"],
        golden["processing_version_alias"],
        golden["base_procver_of_procver"],
    )
    n = versioned_count(
        golden["diasource"], resolver, "pv2", "diasource",
        keys=("diaobjectid", "visit"),
    ).collect()[0]["n"]
    m = golden_pandas["base_procver_of_procver"]
    bpvs = set(
        m[(m.procver_id == resolver.procver_id("pv2")) & (m._table == "diasource")]
        .base_procver_id
    )
    src = golden_pandas["diasource"]
    expected = (
        src[src.base_procver_id.isin(bpvs)][["diaobjectid", "visit"]]
        .drop_duplicates()
        .shape[0]
    )
    assert n == expected

    ext = table_extremes(golden["diasource"]).collect()[0]
    assert ext["min_t"] == golden_pandas["diasource"].midpointmjdtai.min()
    assert ext["max_t"] == golden_pandas["diasource"].midpointmjdtai.max()


def test_object_search_cone_and_criteria(golden, spark):
    from fastdb_spark.queries.objstats import build_objstats
    from fastdb_spark.versions import ProcverResolver

    resolver = ProcverResolver(
        golden["processing_version"],
        golden["processing_version_alias"],
        golden["base_procver_of_procver"],
    )
    per_band, _ = build_objstats(golden, resolver, "pv2")
    roots = golden["root_diaobject"]
    hits = object_search(
        per_band,
        positions=roots,
        ra=42.0,
        dec=13.0,
        radius_deg=25.0 / 3600.0,
        ndets_min=1,
    )
    assert {r["rootid"] for r in hits.select("rootid").distinct().collect()} == {
        ROOT[0], ROOT[1], ROOT[2],
    }
    none = object_search(per_band, ndets_min=10_000)
    assert none.count() == 0

def test_salted_aggregate_matches_plain(spark):
    from fastdb_spark.operators.skew import salted_sum_count

    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 5.0)],
        ["k", "v"],
    )
    got = {r["k"]: (r["sum_value"], r["n"]) for r in
           salted_sum_count(df, ["k"], "v").collect()}
    assert got["hot"] == (sum(range(1000)), 1000)
    assert got["cold"] == (5.0, 1)


def test_get_object_infos_golden(golden, spark):
    from fastdb_spark.queries.ltcv import get_object_infos
    from fastdb_spark.versions import ProcverResolver

    resolver = ProcverResolver(
        golden["processing_version"],
        golden["processing_version_alias"],
        golden["base_procver_of_procver"],
    )
    infos = get_object_infos(golden, resolver, "pv2")
    rows = {r["rootid"]: r for r in infos.collect()}
    assert len(rows) == 4
    assert all(r["ra"] is not None and r["ndets"] > 0 for r in rows.values())
    ids = spark.createDataFrame([(ROOT[0],)], ["rootid"])
    assert get_object_infos(golden, resolver, "pv2", objids=ids).count() == 1


def test_paginate_ranged_matches_window_paginate(spark):
    """The range-partitioned page (no single-task global window) must
    return exactly the window paginate's rows, in any order, including
    pages straddling partition boundaries and pages past the end."""
    from fastdb_spark.operators.paginate import paginate_ranged

    df = spark.range(0, 1000).selectExpr("id AS k", "id % 7 AS v")
    for off, lim in [(0, 50), (137, 41), (990, 50), (1000, 10), (2000, 5)]:
        want = sorted(r["k"] for r in paginate(df, ["k"], off, lim).collect())
        got = sorted(
            r["k"] for r in paginate_ranged(df, ["k"], off, lim, num_ranges=8).collect()
        )
        assert got == want, (off, lim)


def test_jsonl_roundtrip(spark, tmp_path):
    from fastdb_spark.catalog import Catalog
    from fastdb_spark.sources.export import export_jsonl, read_jsonl

    docs = Catalog(spark, "/root/testdata/sf0.001").table("documents")
    p = str(tmp_path / "docs_jsonl")
    export_jsonl(docs, p)
    back = read_jsonl(
        spark, p, "doc_id long, text string, lang string, source string, n_chars long"
    )
    a = docs.orderBy("doc_id").toPandas()
    b = back.select(*a.columns).orderBy("doc_id").toPandas()
    assert a.equals(b)


def test_read_wet_records(spark, tmp_path):
    """Synthetic WET file (warcinfo preamble + two conversion records +
    one empty conversion) parses into (url, date, text) rows; the
    preamble and the empty record are rejected."""
    from fastdb_spark.sources.webtext import read_wet, wet_to_documents

    wet = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "\r\n"
        "software: test\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/a\r\n"
        "WARC-Date: 2026-01-02T03:04:05Z\r\n"
        "Content-Length: 11\r\n"
        "\r\n"
        "hello world\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/b\r\n"
        "WARC-Date: 2026-01-02T03:04:06Z\r\n"
        "\r\n"
        "second page text here\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/empty\r\n"
        "WARC-Date: 2026-01-02T03:04:07Z\r\n"
        "\r\n"
        "\r\n"
    )
    p = tmp_path / "test.warc.wet"
    p.write_text(wet)
    out = read_wet(spark, str(p)).orderBy("url").collect()
    assert [(r["url"], r["text"]) for r in out] == [
        ("http://example.com/a", "hello world"),
        ("http://example.com/b", "second page text here"),
    ]
    assert out[0]["warc_date"] == "2026-01-02T03:04:05Z"

    docs = wet_to_documents(read_wet(spark, str(p)))
    rows = docs.collect()
    assert {r["source"] for r in rows} == {"commoncrawl"}
    assert len({r["doc_id"] for r in rows}) == 2  # deterministic distinct ids
    again = {r["doc_id"] for r in wet_to_documents(read_wet(spark, str(p))).collect()}
    assert again == {r["doc_id"] for r in rows}  # stable across re-reads


def test_read_warc_html_extraction(spark, tmp_path):
    """Raw WARC response -> HTTP-body payload -> stdlib HTML text
    extraction (script/style dropped, whitespace collapsed)."""
    from fastdb_spark.sources.webtext import (
        extract_text_from_html,
        read_warc_responses,
    )

    warc = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://example.com/page\r\n"
        "WARC-Date: 2026-01-02T00:00:00Z\r\n"
        "\r\n"
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html\r\n"
        "\r\n"
        "<html><head><style>b{color:red}</style><script>var x=1;</script>"
        "</head><body><h1>Title</h1><p>Some   body\n text.</p></body></html>\r\n"
        "\r\n"
    )
    p = tmp_path / "test.warc"
    p.write_text(warc)
    resp = read_warc_responses(spark, str(p))
    rows = extract_text_from_html(resp).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "http://example.com/page"
    assert rows[0]["text"] == "Title Some body text."


def test_full_llm_pipeline_end_to_end(spark, tmp_path):
    """The whole training-data flow on real operators: corpus -> curation
    (quality + exact/near dedup) -> benchmark decontamination ->
    leakage-safe split -> train-split sequence packing -> JSONL export,
    with the count/leakage invariants checked at each stage."""
    from fastdb_spark.catalog import Catalog
    from fastdb_spark.pipeline.corpus import exactdup_docs
    from fastdb_spark.pipeline.curate import curate_corpus
    from fastdb_spark.pipeline.decontam import decontaminate
    from fastdb_spark.pipeline.packing import pack_sequences
    from fastdb_spark.pipeline.sample import leakage_safe_split
    from fastdb_spark.sources.export import export_jsonl, read_jsonl

    corpus = exactdup_docs(Catalog(spark, "/root/testdata/sf0.001").table("documents"))
    n0 = corpus.count()

    kept = curate_corpus(corpus)
    docs = corpus.join(kept.select("doc_id"), "doc_id", "left_semi")
    assert 0 < docs.count() < n0  # quality+dedup dropped someone

    ev = docs.filter(F.col("doc_id") % 11 == 0)
    tr = docs.filter(F.col("doc_id") % 11 != 0)
    clean = decontaminate(tr, ev, n=8)
    assert clean.count() <= tr.count()

    split = leakage_safe_split(clean, {"train": 0.8, "val": 0.1, "test": 0.1})
    train = split.filter(F.col("split") == "train")
    assert 0 < train.count() < clean.count()

    ledger = pack_sequences(train, seq_len=256)
    tot = ledger.agg(F.sum("n_tokens")).first()[0]
    last = ledger.orderBy(F.desc("seq_id"), F.desc("seq_offset")).first()
    assert last["seq_id"] + last["n_seqs_spanned"] - 1 == (tot - 1) // 256

    out = str(tmp_path / "train_jsonl")
    export_jsonl(train.join(ledger.select("doc_id", "seq_id"), "doc_id"), out)
    back = read_jsonl(spark, out)
    assert back.count() == train.count()
