"""Avro alert codec: pure-Python spec codec + the gated JVM fast path.

The schema below is shaped like the reference's broker-message alert
(``share/avsc/fastdb.v10_0_0.BrokerMessage.avsc``: long ids, nullable
strings, a nested diaSource record, nullable prv-history arrays, nullable
bytes cutouts, a classifications record array) — the real ingest payload
decoded end-to-end without any avro package in the image.
"""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from fastdb_spark.sources import avro_codec
from fastdb_spark.sources.kafka import decode_alert_frame, encode_alert_frame

DIA_SOURCE = {
    "type": "record",
    "name": "diaSource",
    "namespace": "test.v1",
    "fields": [
        {"name": "diaSourceId", "type": "long"},
        {"name": "diaObjectId", "type": ["null", "long"], "default": None},
        {"name": "midpointMjdTai", "type": "double"},
        {"name": "band", "type": ["null", "string"], "default": None},
        {"name": "psfFlux", "type": ["null", "float"], "default": None},
        {"name": "psfFluxErr", "type": ["null", "float"], "default": None},
        {"name": "ra", "type": "double"},
        {"name": "dec", "type": "double"},
    ],
}

ALERT_SCHEMA = {
    "type": "record",
    "name": "BrokerMessage",
    "namespace": "test.v1",
    "fields": [
        {"name": "diaSourceId", "type": "long"},
        {"name": "observation_reason", "type": ["null", "string"], "default": None},
        {"name": "diaSource", "type": DIA_SOURCE},
        {
            "name": "prvDiaSources",
            "type": ["null", {"type": "array", "items": "test.v1.diaSource"}],
            "default": None,
        },
        {"name": "cutoutScience", "type": ["null", "bytes"], "default": None},
        {"name": "brokerName", "type": "string"},
        {
            "name": "classifications",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "classificationDict",
                    "fields": [
                        {"name": "classId", "type": "int"},
                        {"name": "probability", "type": "float"},
                    ],
                },
            },
        },
    ],
}


def _mk_alert(i: int) -> dict:
    src = {
        "diaSourceId": 1000 + i,
        "diaObjectId": 77 if i % 2 == 0 else None,
        "midpointMjdTai": 60000.5 + i,
        "band": "r" if i % 3 else None,
        "psfFlux": 123.5 + i,
        "psfFluxErr": 1.25,
        "ra": 180.0 + i * 0.1,
        "dec": -30.0 + i * 0.1,
    }
    return {
        "diaSourceId": 1000 + i,
        "observation_reason": None if i % 2 else f"survey-{i}",
        "diaSource": src,
        "prvDiaSources": None
        if i % 4 == 0
        else [dict(src, diaSourceId=1000 + i - j) for j in range(1, 1 + i % 3)],
        "cutoutScience": bytes([i % 256, 1, 2, 3]) if i % 2 else None,
        "brokerName": "fink",
        "classifications": [
            {"classId": 111, "probability": 0.75},
            {"classId": 222, "probability": 0.25},
        ],
    }


def test_codec_roundtrip_python():
    sch = avro_codec.parse(json.dumps(ALERT_SCHEMA))
    for i in range(8):
        alert = _mk_alert(i)
        raw = sch.encode(alert)
        back = sch.decode(raw)
        # float32 fields lose precision by design; compare with tolerance
        assert back["diaSourceId"] == alert["diaSourceId"]
        assert back["observation_reason"] == alert["observation_reason"]
        assert back["cutoutScience"] == alert["cutoutScience"]
        assert back["diaSource"]["diaObjectId"] == alert["diaSource"]["diaObjectId"]
        assert back["diaSource"]["ra"] == alert["diaSource"]["ra"]  # double: exact
        assert math.isclose(
            back["diaSource"]["psfFlux"], alert["diaSource"]["psfFlux"], rel_tol=1e-6
        )
        if alert["prvDiaSources"] is None:
            assert back["prvDiaSources"] is None
        else:
            assert len(back["prvDiaSources"]) == len(alert["prvDiaSources"])
        assert [c["classId"] for c in back["classifications"]] == [111, 222]


def test_codec_primitives_and_edge_values():
    for typ, vals in [
        ("long", [0, -1, 1, 63, -64, 2**53, -(2**62), 2**63 - 1, -(2**63)]),
        ("int", [0, -1, 2**31 - 1, -(2**31)]),
        ("double", [0.0, -1.5, 1e300, float("inf")]),
        ("string", ["", "héllo", "x" * 1000]),
        ("boolean", [True, False]),
    ]:
        sch = avro_codec.parse(json.dumps(typ))
        for v in vals:
            assert sch.decode(sch.encode(v)) == v


def test_avro_alert_batch_end_to_end(spark):
    """Encode real alert payloads to avro bytes, ship them as a binary
    'value' column (the Kafka message shape), decode through the engine's
    frame transform, and get the nested alert columns back."""
    schema_json = json.dumps(ALERT_SCHEMA)
    sch = avro_codec.parse(schema_json)
    alerts = [_mk_alert(i) for i in range(16)]
    payloads = [(sch.encode(a),) for a in alerts]
    raw = spark.createDataFrame(payloads, "value binary")

    decoded = decode_alert_frame(raw, schema_json)
    rows = {r["diaSourceId"]: r for r in decoded.collect()}
    assert len(rows) == 16
    r5 = rows[1005]
    assert r5["observation_reason"] is None
    assert r5["diaSource"]["midpointMjdTai"] == pytest.approx(60005.5)
    assert r5["diaSource"]["band"] == "r"
    assert len(r5["prvDiaSources"]) == 2
    assert rows[1004]["prvDiaSources"] is None
    assert r5["cutoutScience"] == bytes([5, 1, 2, 3])
    assert [c["classId"] for c in r5["classifications"]] == [111, 222]
    assert rows[1006]["observation_reason"] == "survey-6"


def test_avro_encode_frame_roundtrip(spark):
    """The produce path: nested frame -> avro bytes -> decode -> equal."""
    schema_json = json.dumps(ALERT_SCHEMA)
    sch = avro_codec.parse(schema_json)
    alerts = [_mk_alert(i) for i in range(6)]
    raw = spark.createDataFrame([(sch.encode(a),) for a in alerts], "value binary")
    nested = decode_alert_frame(raw, schema_json)

    reencoded = encode_alert_frame(nested, schema_json)
    back = decode_alert_frame(reencoded, schema_json)
    a = sorted(
        [(r["diaSourceId"], r["brokerName"], r["cutoutScience"]) for r in nested.collect()]
    )
    b = sorted(
        [(r["diaSourceId"], r["brokerName"], r["cutoutScience"]) for r in back.collect()]
    )
    assert a == b
