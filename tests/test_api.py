"""API facade tests: the reference's endpoint surface over a parquet
catalog directory (the 'switch from the reference' contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdb_spark.api import FastdbAPI

from .conftest import ROOT


@pytest.fixture(scope="module")
def api(spark, golden_pandas, tmp_path_factory):
    root = tmp_path_factory.mktemp("catalog")
    for name, pdf in golden_pandas.items():
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            str(root / f"{name}.parquet")
        )
    return FastdbAPI(spark, str(root), queue_root=str(root / "queue"))


def test_processing_versions(api):
    names = [r["description"] for r in api.processing_versions().collect()]
    assert names == sorted(names)
    assert {"pv1", "pv2", "pv3", "realtime", "default"} <= set(names)


def test_get_many_ltcvs_roundtrip(api):
    flat = api.get_many_ltcvs("default", which="patch")
    assert flat.count() > 0
    nested = api.get_many_ltcvs("default", which="patch", nested=True)
    assert nested.count() == 4


def test_objid_normalization_mixed(api):
    # int diaobjectid and uuid rootid both resolve (reference ltcv.py:498-521)
    df = api.get_many_ltcvs("pv2", objids=[200, ROOT[1]], which="detections")
    roots = {r["rootid"] for r in df.select("rootid").distinct().collect()}
    assert roots == {ROOT[0], ROOT[1]}


def test_get_random_ltcv(api):
    df = api.get_random_ltcv("pv2", which="detections")
    assert df.select("rootid").distinct().count() <= 1


def test_count_endpoint(api, golden_pandas):
    n = api.count("diasource", "pv2")
    assert n > 0
    est = api.count("diasource", "pv2", estimate=True)
    assert abs(est - n) <= max(3, 0.1 * n)  # HLL estimate in the ballpark


def test_object_search_endpoint(api):
    hits = api.object_search(
        "pv2", ra=42.0, dec=13.0, radius_deg=25.0 / 3600.0, ndets_min=1
    )
    roots = {r["rootid"] for r in hits.select("rootid").distinct().collect()}
    assert roots == {ROOT[0], ROOT[1], ROOT[2]}


def test_hot_transients_endpoint(api):
    hot = api.get_hot_transients("realtime", detected_since_mjd=60040.0)
    roots = {r["rootid"] for r in hot.select("rootid").distinct().collect()}
    assert ROOT[0] not in roots and ROOT[1] in roots


def test_run_sql_passthrough(api):
    out = api.run_sql(
        "SELECT count(*) AS n FROM diasource WHERE band = 'g'"
    ).collect()
    assert out[0]["n"] > 0


def test_run_sql_parameterized(api):
    out = api.run_sql(
        "SELECT count(*) AS n FROM diasource WHERE band = :b",
        subdict={"b": "g"},
    ).collect()
    assert out[0]["n"] > 0


def test_async_sql_lifecycle(api):
    qid = api.submit_sql_query(
        "00000000-0000-4000-8000-0000000000ff",
        ["SELECT diaobjectid, count(*) AS n FROM diasource GROUP BY diaobjectid"],
    )
    assert api.check_sql_query(qid)["status"] == "queued"
    api.queue.run_one()
    assert api.check_sql_query(qid)["status"] == "finished"


def test_alert_reconstruction_golden(api, golden):
    from fastdb_spark.queries.reconstruct import reconstruct_alerts

    det = golden["diasource"].filter(F.col("base_procver_id").isNotNull())
    frc = golden["diaforcedsource"].withColumnRenamed(
        "diaforcedsourceid", "diaforcedsourceid"
    )
    objects = golden["diaobject_position"].select(
        "diaobjectid", "ra", "dec"
    ).dropDuplicates(["diaobjectid"])
    new = det.filter(F.col("midpointmjdtai") >= 60055.0)
    alerts = reconstruct_alerts(new, det, frc, objects)
    rows = alerts.collect()
    assert len(rows) == new.count()
    for r in rows[:5]:
        t = r["diaSource"]["midpointMjdTai"]
        for p in r["prvDiaSources"]:
            assert t - 365.0 <= p["midpointmjdtai"] < t
        for p in r["prvDiaForcedSources"]:
            assert p["midpointmjdtai"] < t - 1.0
        assert r["diaObject"] is not None


def test_get_broker_info(api):
    # pv1 maps bpv1b > bpv1a > bpv1: the duplicate (fink, topic-a) message
    # must come from bpv1a (p=0.9), not bpv1 (p=0.6)
    out = api.get_broker_info([10000000, 20000000], "pv1").collect()
    rows = {(r["diasourceid"], r["brokername"], r["topic"]): r["info"] for r in out}
    assert rows[(10000000, "fink", "topic-a")] == '{"class": "SNIa", "p": 0.9}'
    assert (10000000, "antares", "topic-b") in rows
    # source 20000000 is bpv2-only -> not visible under pv1
    assert not any(k[0] == 20000000 for k in rows)
    # broker/topic filters (reference's optional narrowing)
    only_fink = api.get_broker_info(10000000, "pv1", brokername="fink").collect()
    assert {r["brokername"] for r in only_fink} == {"fink"}
    # and under pv2 the bpv2 message appears
    pv2 = api.get_broker_info([20000000], "pv2").collect()
    assert len(pv2) == 1 and pv2[0]["info"] == '{"class": "AGN", "p": 0.7}'
