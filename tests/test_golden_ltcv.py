"""Golden-fixture tests for the versioned lightcurve queries.

Oracle: duckdb executing the reference's SQL semantics (DISTINCT ON ->
row_number window) directly over the same pandas fixture frames.  This
mirrors the reference's own test strategy (reference ``tests/test_ltcv.py``
against ``tests/conftest.py`` fixtures; SURVEY.md §5).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastdb_spark.queries.ltcv import (
    assemble_nested,
    get_hot_ltcvs,
    many_object_ltcvs,
    resolve_objects,
)
from fastdb_spark.versions import ProcverResolver

from .conftest import BPV, PV, ROOT


@pytest.fixture(scope="module")
def resolver(golden):
    return ProcverResolver(
        golden["processing_version"],
        golden["processing_version_alias"],
        golden["base_procver_of_procver"],
    )


def _duck(golden_pandas) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, pdf in golden_pandas.items():
        con.register(name, pdf)
    return con


def _oracle_extract(con, pvid: str, table: str, idcol: str, mjd_now=None, bands=None):
    """Reference detections/forced extract semantics in duckdb SQL
    (``src/ltcv.py:638-712``)."""
    band_pred = (
        "AND s.band IN (" + ",".join(f"'{b}'" for b in bands) + ")" if bands else ""
    )
    mjd_pred = f"AND s.midpointmjdtai <= {mjd_now}" if mjd_now is not None else ""
    return con.execute(
        f"""
        WITH objmap AS (
          SELECT diaobjectid, rootid FROM (
            SELECT o.*, row_number() OVER (
                PARTITION BY o.diaobjectid
                ORDER BY m.priority DESC, o.base_procver_id DESC) rn
            FROM diaobject o
            JOIN base_procver_of_procver m
              ON o.base_procver_id = m.base_procver_id
             AND m._table = 'diaobject' AND m.procver_id = '{pvid}'
          ) WHERE rn = 1
        )
        SELECT rootid, visit, diaobjectid, band, midpointmjdtai,
               psfflux, psffluxerr
        FROM (
          SELECT t.rootid, s.visit, s.diaobjectid, s.band, s.midpointmjdtai,
                 s.psfflux, s.psffluxerr,
                 row_number() OVER (PARTITION BY t.rootid, s.visit
                     ORDER BY m.priority DESC, s.{idcol} DESC) rn
          FROM {table} s
          JOIN objmap t ON s.diaobjectid = t.diaobjectid
          JOIN base_procver_of_procver m
            ON s.base_procver_id = m.base_procver_id
           AND m._table = '{table}' AND m.procver_id = '{pvid}'
          WHERE 1=1 {band_pred} {mjd_pred}
        ) WHERE rn = 1
        """
    ).df()


def _cmp(spark_df, oracle_pdf, keys=("rootid", "visit")):
    a = spark_df.toPandas().sort_values(list(keys)).reset_index(drop=True)
    b = oracle_pdf.sort_values(list(keys)).reset_index(drop=True)
    assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
    for c in b.columns:
        if c not in a.columns:
            continue
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), rtol=1e-6), c
        else:
            assert (av == bv).all(), c


def test_procver_resolution(resolver):
    assert resolver.procver_id("pv2") == PV["pv2"]
    assert resolver.procver_id(PV["pv1"]) == PV["pv1"]
    assert resolver.procver_id("default") == PV["pv2"]  # alias
    with pytest.raises(KeyError):
        resolver.procver_id("nope")
    assert resolver.highest_priority_bpv("pv2", "diasource") == BPV["bpv2a"]


def test_priority_fallback_detections(golden, golden_pandas, resolver):
    """pv2 lightcurves must take bpv2a rows where they exist (the
    [60020,60025] override window) and bpv2 elsewhere — reference
    ``tests/test_ltcv.py`` pvc_pv2 mixed-bpv check."""
    det = many_object_ltcvs(golden, resolver, "pv2", which="detections")
    con = _duck(golden_pandas)
    oracle = _oracle_extract(con, PV["pv2"], "diasource", "diasourceid")
    _cmp(det, oracle)

    # rows whose visit has a bpv2a override must carry the override's 1.5x
    # flux — value-observable shadowing
    src = golden_pandas["diasource"]
    ov = src[src.base_procver_id == BPV["bpv2a"]][["diaobjectid", "visit", "psfflux"]]
    assert len(ov), "override window empty"
    got = det.toPandas().merge(ov, on=["diaobjectid", "visit"], suffixes=("", "_ov"))
    assert len(got) == len(ov)
    assert np.allclose(got.psfflux, got.psfflux_ov, rtol=1e-6)


def test_duplicate_object_union(golden, golden_pandas, resolver):
    """Root 1 has diaobjectids 201 (integer MJDs) and 2011 (half MJDs)
    under bpv2; its lightcurve must union both (reference
    ``tests/conftest.py:294-296,415-418``)."""
    det = many_object_ltcvs(golden, resolver, "pv3" if False else "pv2", which="detections")
    r1 = det.filter(F.col("rootid") == ROOT[1]).toPandas()
    objids = set(r1["diaobjectid"])
    assert {201, 2011} <= objids
    # half-MJD visits interleave integer ones
    mjds = sorted(r1["midpointmjdtai"])
    assert any(abs(m % 1.0 - 0.5) < 1e-6 for m in mjds)


def test_patch_join_golden(golden, golden_pandas, resolver):
    """ispatch exactly where a detection exists with no forced row
    (forced stops 10d after last det in-bpv; realtime sources run to
    60060 while realtime forced stops at 60055)."""
    patched = many_object_ltcvs(golden, resolver, "realtime", which="patch")
    pdf = patched.toPandas()
    assert (pdf[pdf.ispatch].isdet).all()
    # realtime: sources through 60060, forced through 60055 -> patches exist
    assert pdf.ispatch.any()
    assert pdf[pdf.ispatch].midpointmjdtai.min() > 60055.0

    con = _duck(golden_pandas)
    f = _oracle_extract(con, PV["realtime"], "diaforcedsource", "diaforcedsourceid")
    s = _oracle_extract(con, PV["realtime"], "diasource", "diasourceid")
    con.register("f", f)
    con.register("s", s)
    oracle = con.execute(
        """
        SELECT COALESCE(f.rootid, s.rootid) AS rootid,
               COALESCE(f.visit, s.visit) AS visit,
               CASE WHEN f.rootid IS NULL THEN s.psfflux ELSE f.psfflux END AS psfflux,
               (s.rootid IS NOT NULL) AS isdet,
               (f.rootid IS NULL) AS ispatch
        FROM f FULL OUTER JOIN s ON f.rootid = s.rootid AND f.visit = s.visit
        """
    ).df()
    _cmp(patched.select("rootid", "visit", "psfflux", "isdet", "ispatch"), oracle)


def test_mjd_now_time_travel(golden, golden_pandas, resolver):
    """P3: mjd_now truncates the lightcurve (reference mjd_now kwarg)."""
    cut = 60030.0
    det = many_object_ltcvs(golden, resolver, "pv2", which="detections", mjd_now=cut)
    pdf = det.toPandas()
    assert (pdf.midpointmjdtai <= cut).all()
    con = _duck(golden_pandas)
    oracle = _oracle_extract(con, PV["pv2"], "diasource", "diasourceid", mjd_now=cut)
    _cmp(det, oracle)


def test_band_filter(golden, resolver):
    det = many_object_ltcvs(golden, resolver, "pv2", which="detections", bands=["g"])
    bands = {r["band"] for r in det.select("band").distinct().collect()}
    assert bands == {"g"}


def test_objids_restriction(golden, resolver, spark):
    ids = spark.createDataFrame([(ROOT[0],)], ["rootid"])
    det = many_object_ltcvs(golden, resolver, "pv2", which="detections", objids=ids)
    roots = {r["rootid"] for r in det.select("rootid").distinct().collect()}
    assert roots == {ROOT[0]}


def test_nested_assembly(golden, resolver):
    patched = many_object_ltcvs(golden, resolver, "pv2", which="patch")
    nested = assemble_nested(patched)
    rows = {r["rootid"]: r for r in nested.collect()}
    assert set(rows) == {ROOT[i] for i in range(4)}
    for r in rows.values():
        mjds = [p["midpointmjdtai"] for p in r["lightcurve"]]
        assert mjds == sorted(mjds)
        assert r["nobs"] == len(mjds)


def test_hot_ltcvs(golden, resolver):
    """Only roots with a detection after the cut appear (root 0's realtime
    detections end at 60030)."""
    hot = get_hot_ltcvs(golden, resolver, "realtime", detected_since_mjd=60040.0)
    roots = {r["rootid"] for r in hot.select("rootid").distinct().collect()}
    assert ROOT[0] not in roots
    assert ROOT[1] in roots and ROOT[2] in roots


def test_resolve_objects_dedup(golden, resolver):
    objmap = resolve_objects(golden["diaobject"], resolver, "pv2")
    pdf = objmap.toPandas()
    assert pdf.diaobjectid.is_unique
    assert set(pdf[pdf.diaobjectid.isin([201, 2011])].rootid) == {ROOT[1]}
