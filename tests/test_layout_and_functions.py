"""Layout (partition pruning) + scalar function tests + gold refresh."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdb_spark.functions.photometry import (
    flux2mag,
    mag2flux,
    mjd_from_timestamp,
    pack_flags,
    sexagesimal_to_deg,
    timestamp_from_mjd,
    unpack_flag,
    visit_from_mjd,
)
from fastdb_spark.layout import ZONE_COL, read_cone, write_spatial
from fastdb_spark.operators.spatial import cone_search
from fastdb_spark.queries.refresh import read_objstats, refresh_objstats
from fastdb_spark.versions import ProcverResolver

from .conftest import ROOT


def test_spatial_layout_prunes_partitions(spark, golden, tmp_path):
    path = str(tmp_path / "diasource_spatial")
    det = golden["diasource"].filter(F.col("ra").isNotNull())
    write_spatial(det, path)

    hits = read_cone(spark, path, 42.0, 13.0, 25.0 / 3600.0)
    plain = cone_search(det, 42.0, 13.0, 25.0 / 3600.0)
    assert hits.count() == plain.count() > 0

    # partition pruning must appear in the physical plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hits.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert ZONE_COL in plan.split("PartitionFilters", 1)[1][:300]


def test_flux_mag_roundtrip(spark):
    df = spark.createDataFrame([(912.011,), (2290.87,), (-5.0,)], ["flux"])
    out = df.select(
        flux2mag(F.col("flux")).alias("mag"),
        mag2flux(flux2mag(F.col("flux"))).alias("back"),
    ).collect()
    assert out[0]["mag"] == pytest.approx(24.0, abs=1e-4)
    assert out[0]["back"] == pytest.approx(912.011, rel=1e-9)
    assert out[2]["mag"] == 99.0  # non-positive flux sentinel


def test_sexagesimal(spark):
    df = spark.createDataFrame(
        [("12:30:00", "-45:15:30"), ("00:00:36", "+10:00:00")], ["ra_s", "dec_s"]
    )
    out = df.select(
        sexagesimal_to_deg(F.col("ra_s"), is_ra=True).alias("ra"),
        sexagesimal_to_deg(F.col("dec_s"), is_ra=False).alias("dec"),
    ).collect()
    assert out[0]["ra"] == pytest.approx(187.5)
    assert out[0]["dec"] == pytest.approx(-(45 + 15 / 60 + 30 / 3600))
    assert out[1]["ra"] == pytest.approx(0.15)
    assert out[1]["dec"] == pytest.approx(10.0)


def test_mjd_timestamp_roundtrip(spark):
    df = spark.createDataFrame([(60000.5,)], ["mjd"])
    out = df.select(
        mjd_from_timestamp(timestamp_from_mjd(F.col("mjd"))).alias("back")
    ).collect()
    assert out[0]["back"] == pytest.approx(60000.5, abs=1e-6)
    assert (
        df.select(visit_from_mjd(F.col("mjd")).alias("v")).collect()[0]["v"]
        == 1200010000
    )


def test_mjd_tai_scale_golden(spark):
    """Golden TAI MJD values (astropy Time(..., scale='utc').tai.mjd — the
    reference converts midpointmjdtai with scale='tai', e.g.
    src/webserver/spectrumapp.py:110)."""
    import datetime as dt

    from fastdb_spark.functions.photometry import tai_offset_seconds

    rows = [
        ("2021-06-01T00:00:00", 59366.0 + 37.0 / 86400.0, 37),
        ("2017-01-01T00:00:00", 57754.0 + 37.0 / 86400.0, 37),
        ("2015-01-01T00:00:00", 57023.0 + 35.0 / 86400.0, 35),
        ("1998-01-01T00:00:00", 50814.0 + 31.0 / 86400.0, 31),
        ("1980-06-01T00:00:00", 44391.0 + 19.0 / 86400.0, 19),
    ]
    df = spark.createDataFrame(
        [(dt.datetime.fromisoformat(s),) for s, _, _ in rows], ["ts"]
    )
    out = df.select(
        mjd_from_timestamp(F.col("ts"), scale="tai").alias("mjd_tai"),
        tai_offset_seconds(F.unix_timestamp("ts")).alias("off"),
    ).collect()
    for r, (_, want_mjd, want_off) in zip(out, rows):
        assert r["off"] == want_off
        assert r["mjd_tai"] == pytest.approx(want_mjd, abs=1e-9)

    # TAI roundtrip: timestamp -> tai mjd -> timestamp
    back = df.select(
        timestamp_from_mjd(
            mjd_from_timestamp(F.col("ts"), scale="tai"), scale="tai"
        ).alias("back"),
        "ts",
    ).collect()
    for r in back:
        assert abs((r["back"] - r["ts"]).total_seconds()) < 1e-5


def test_bitmask_pack_unpack(spark):
    df = spark.createDataFrame([(True, False), (False, True)], ["a", "b"])
    packed = df.select(
        pack_flags((F.col("a"), 1), (F.col("b"), 2)).alias("flags")
    )
    vals = [r["flags"] for r in packed.collect()]
    assert vals == [1, 2]
    back = packed.select(
        unpack_flag(F.col("flags"), 1).alias("a"),
        unpack_flag(F.col("flags"), 2).alias("b"),
    ).collect()
    assert (back[0]["a"], back[0]["b"]) == (True, False)


def test_objstats_gold_refresh(spark, golden, tmp_path):
    resolver = ProcverResolver(
        golden["processing_version"],
        golden["processing_version_alias"],
        golden["base_procver_of_procver"],
    )
    gold = str(tmp_path / "gold")
    assert read_objstats(spark, gold, "pv2") is None
    refresh_objstats(spark, golden, resolver, "pv2", gold)
    got = read_objstats(spark, gold, "pv2")
    assert got is not None
    per_band, combined = got
    assert {r["rootid"] for r in combined.select("rootid").collect()} == {
        ROOT[i] for i in range(4)
    }
    # refresh is idempotent-overwrite
    refresh_objstats(spark, golden, resolver, "pv2", gold)
    assert read_objstats(spark, gold, "pv2")[1].count() == 4


def test_morton_key_clusters_neighbors(spark):
    """Z-order property: spatially-near points get numerically-near keys
    (shared high bits), far points differ in high bits — the invariant
    row-group pruning relies on."""
    from fastdb_spark.layout import morton_key

    rows = [
        (1, 100.0, -30.0),
        (2, 100.001, -30.001),  # ~arcsec neighbor of 1
        (3, 100.002, -29.999),  # also near 1
        (4, 250.0, 45.0),  # far
    ]
    df = spark.createDataFrame(rows, ["id", "ra", "dec"])
    keys = {
        r["id"]: r["k"]
        for r in df.select("id", morton_key(F.col("ra"), F.col("dec")).alias("k")).collect()
    }
    # near pair within a few cells; far pair separated by many high bits
    assert abs(keys[1] - keys[2]) < (1 << 10)
    assert abs(keys[1] - keys[3]) < (1 << 12)
    assert abs(keys[1] - keys[4]) > (1 << 24)
    # keys are bounded by 2*bits
    assert all(0 <= k < (1 << 32) for k in keys.values())


def test_zordered_layout_roundtrip_and_rowgroup_locality(spark, tmp_path):
    from fastdb_spark.layout import ZONE_COL, morton_key, write_spatial_zordered

    import numpy as np

    rng = np.random.RandomState(5)
    rows = [
        (int(i), float(rng.uniform(0, 360)), float(rng.uniform(-10, 10)))
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, ["diaobjectid", "ra", "dec"])
    path = str(tmp_path / "sky")
    write_spatial_zordered(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 5000
    assert ZONE_COL in back.columns
    # within a zone the file order follows the morton key (monotone ra
    # cell prefix when dec is fixed-ish) — verify keys are sorted per file
    import glob

    f = sorted(glob.glob(f"{path}/{ZONE_COL}=*/*.parquet"))[0]
    pdf = spark.read.parquet(f).select(
        morton_key(F.col("ra"), F.col("dec")).alias("k")
    ).toPandas()
    assert (pdf["k"].diff().dropna() >= 0).all()


def test_catalog_events_ts_encoding_matrix(spark, tmp_path):
    """Catalog.table('events') must normalize ts to session-TZ TIMESTAMP
    whatever parquet encoding the generator used: MICROS isAdjustedToUTC
    false (reads as TIMESTAMP_NTZ), true (plain LTZ), or NANOS (legacy
    long path).  Round 2 was lost to exactly this changing under us."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastdb_spark.catalog import Catalog

    base = pa.array([1_700_000_000_000_000 + i for i in range(5)])
    cases = {
        "ntz": pa.table({"event_id": pa.array(range(5), pa.int64()),
                         "ts": base.cast(pa.timestamp("us"))}),
        "ltz": pa.table({"event_id": pa.array(range(5), pa.int64()),
                         "ts": base.cast(pa.timestamp("us", tz="UTC"))}),
        "nanos": pa.table({"event_id": pa.array(range(5), pa.int64()),
                           "ts": pa.array([v * 1000 for v in
                                           [1_700_000_000_000_000 + i for i in range(5)]],
                                          pa.timestamp("ns"))}),
    }
    for name, tbl in cases.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"),
                       coerce_timestamps=None, use_deprecated_int96_timestamps=False)
        ev = Catalog(spark, str(d)).table("events")
        got = (
            ev.select(F.unix_micros("ts").alias("us"))
            .orderBy("us")
            .collect()
        )
        assert [r["us"] for r in got] == [
            1_700_000_000_000_000 + i for i in range(5)
        ], name
