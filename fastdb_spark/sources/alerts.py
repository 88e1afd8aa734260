"""Alert wrangling: nested broker alerts -> relational catalog rows.

Re-expresses the reference's per-message Python wrangling (reference
``src/services/brokerconsumer.py:463-649``; SURVEY.md S2) as pure column
expressions over a nested alert DataFrame (one row per alert, whatever the
transport — Kafka+avro in production, parquet/json in tests):

- field names are lowercased and filtered against the target table schema
  (the reference's lowercase-filter loop),
- ``prvDiaSources`` / ``prvDiaForcedSources`` arrays explode into rows,
- boolean quality flags pack into the ``diasource_extra``-style bitmask
  (reference ``brokerconsumer.py:453-461``),
- every row gets the ingest watermark ``savetime``
  (reference ``brokerconsumer.py:655,695``; SURVEY.md T3).

All transformations are stateless projections — the streaming job applies
them per micro-batch with no shuffle before the silver merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fastdb_spark import schemas
from fastdb_spark.functions.photometry import pack_flags

_SRC_FIELDS = [
    ("diaSourceId", T.LongType()),
    ("diaObjectId", T.LongType()),
    ("visit", T.LongType()),
    ("band", T.StringType()),
    ("midpointMjdTai", T.DoubleType()),
    ("psfFlux", T.FloatType()),
    ("psfFluxErr", T.FloatType()),
    ("ra", T.DoubleType()),
    ("dec", T.DoubleType()),
    ("raErr", T.FloatType()),
    ("decErr", T.FloatType()),
    ("ra_dec_Cov", T.FloatType()),
    ("psfFluxFlag", T.BooleanType()),
    ("pixelFlags", T.BooleanType()),
    ("centroidFlag", T.BooleanType()),
]

_FRC_FIELDS = [
    ("diaForcedSourceId", T.LongType()),
    ("diaObjectId", T.LongType()),
    ("visit", T.LongType()),
    ("band", T.StringType()),
    ("midpointMjdTai", T.DoubleType()),
    ("psfFlux", T.FloatType()),
    ("psfFluxErr", T.FloatType()),
    ("ra", T.DoubleType()),
    ("dec", T.DoubleType()),
]

_OBJ_FIELDS = [
    ("diaObjectId", T.LongType()),
    ("ra", T.DoubleType()),
    ("dec", T.DoubleType()),
    ("raErr", T.FloatType()),
    ("decErr", T.FloatType()),
]


def _struct(fields) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


#: nested alert schema (one kafka message / avro record per row; field
#: names keep the upstream camelCase — wrangling lowercases them)
ALERT_SCHEMA = T.StructType(
    [
        T.StructField("alertId", T.LongType(), False),
        T.StructField("brokername", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("classifications", T.StringType(), True),  # json
        T.StructField("diaSource", _struct(_SRC_FIELDS), False),
        T.StructField("prvDiaSources", T.ArrayType(_struct(_SRC_FIELDS)), True),
        T.StructField(
            "prvDiaForcedSources", T.ArrayType(_struct(_FRC_FIELDS)), True
        ),
        T.StructField("diaObject", _struct(_OBJ_FIELDS), True),
        T.StructField("cutoutDifference", T.BinaryType(), True),
        T.StructField("cutoutTemplate", T.BinaryType(), True),
    ]
)

#: diasource_extra bitmask bits (reference src/db.py:1793-1837 bit maps)
FLAG_MASKS = {
    "psfFluxFlag": 1 << 0,
    "pixelFlags": 1 << 1,
    "centroidFlag": 1 << 2,
}


def _lowered(struct_col: str, fields, table: str) -> list[Column]:
    """Lowercase-filter struct fields against the target table schema —
    the reference drops alert fields the table doesn't know (S2)."""
    table_cols = {f.name for f in schemas.TABLES[table].fields}
    out = []
    for name, _ in fields:
        low = name.lower()
        if low in table_cols:
            out.append(F.col(f"{struct_col}.{name}").alias(low))
    return out


def _flags(struct_col: str) -> Column:
    return pack_flags(
        *[(F.coalesce(F.col(f"{struct_col}.{n}"), F.lit(False)), m)
          for n, m in FLAG_MASKS.items()]
    )


def wrangle_alerts(
    alerts: DataFrame, base_procver_id: str, savetime: Column | None = None
) -> dict[str, DataFrame]:
    """Explode one nested-alert frame into relational frames keyed like the
    catalog tables (plus ``flags`` and ``savetime``).

    Returns keys: ``diaobject``, ``diasource`` (current + previous),
    ``diaforcedsource``, ``brokerinfo``, ``cutouts``.
    """
    st = savetime if savetime is not None else F.current_timestamp()
    bpv = F.lit(base_procver_id).alias("base_procver_id")

    cur_src = alerts.select(
        *_lowered("diaSource", _SRC_FIELDS, "diasource"),
        bpv,
        _flags("diaSource").alias("flags"),
        st.alias("savetime"),
    )
    prv_src = (
        alerts.select(F.explode("prvDiaSources").alias("p"))
        .select(
            *_lowered("p", _SRC_FIELDS, "diasource"),
            bpv,
            _flags("p").alias("flags"),
            st.alias("savetime"),
        )
    )
    diasource = cur_src.unionByName(prv_src)

    diaforcedsource = (
        alerts.select(F.explode("prvDiaForcedSources").alias("p"))
        .select(
            *_lowered("p", _FRC_FIELDS, "diaforcedsource"),
            bpv,
            st.alias("savetime"),
        )
    )

    diaobject = alerts.filter(F.col("diaObject").isNotNull()).select(
        F.col("diaObject.diaObjectId").alias("diaobjectid"),
        bpv,
        F.col("diaObject.ra").alias("ra"),
        F.col("diaObject.dec").alias("dec"),
        st.alias("savetime"),
    )

    brokerinfo = alerts.select(
        F.col("brokername"),
        F.col("topic"),
        F.col("diaSource.diaSourceId").alias("diasourceid"),
        bpv,
        F.col("diaSource.diaObjectId").alias("diaobjectid"),
        F.col("classifications").alias("info"),
        st.alias("savetime"),
    )

    cutouts = alerts.select(
        F.col("alertId").alias("alertid"),
        F.col("diaSource.diaSourceId").alias("diasourceid"),
        F.col("cutoutDifference"),
        F.col("cutoutTemplate"),
        st.alias("savetime"),
    )

    return {
        "diaobject": diaobject,
        "diasource": diasource,
        "diaforcedsource": diaforcedsource,
        "brokerinfo": brokerinfo,
        "cutouts": cutouts,
    }


def reject_solar_system(wrangled: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Drop alerts with diaobjectid IN (0, NULL) and cascade to children
    (reference ``src/services/source_importer.py:277-298``; SURVEY.md P6)."""
    bad = F.col("diaobjectid").isNull() | (F.col("diaobjectid") == 0)
    out = dict(wrangled)
    for k in ("diaobject", "diasource", "diaforcedsource"):
        out[k] = out[k].filter(~bad)
    out["brokerinfo"] = out["brokerinfo"].filter(~bad)
    return out
