"""Adapter: derive FASTDB-shaped frames from the driver's synthetic tables.

The correctness gate (TESTDATA.md) provides TPC-H-ish tables, not the
astronomy catalog; this module derives deterministic photometry-shaped
views from them so every FASTDB operator (SURVEY.md §2) can be exercised
AND mirrored by an ANSI-SQL duckdb oracle.

Each derivation exists twice, and the two must stay in lockstep:

- a ``*_SQL`` constant — ANSI SQL run by duckdb as the oracle CTE,
- a DataFrame builder — the Spark-side input handed to the real operators.

Conventions: all floats computed as doubles in both dialects; ids stay
integral end-to-end (never pass ids through doubles — reference
``src/util.py:424-440``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- photometry keyed (rootid=l_orderkey, visit=l_linenumber): 1:1 keys,
#     used for the patch join --------------------------------------------------

PHOTOMETRY_SQL = """
SELECT CAST(l_orderkey AS BIGINT)                     AS rootid,
       CAST(l_linenumber AS BIGINT)                   AS visit,
       CAST(((l_orderkey * 1000000 + l_partkey) * 100000 + l_suppkey) * 10 + l_linenumber AS BIGINT) AS srcid,
       CAST(l_suppkey % 3 AS INTEGER)                 AS priority,
       l_returnflag                                   AS band,
       60000.0 + CAST(l_partkey % 1000 AS DOUBLE) * 0.1 AS midpointmjdtai,
       l_extendedprice / 10.0                        AS psfflux,
       1.0 + l_tax * 10.0                             AS psffluxerr,
       l_quantity                                     AS quantity,
       l_discount                                     AS discount,
       CAST(l_partkey % 3600 AS DOUBLE) * 0.1         AS ra,
       CAST((l_partkey * 7) % 1200 AS DOUBLE) * 0.1 - 60.0 AS "dec"
FROM lineitem
"""


def photometry(lineitem: DataFrame) -> DataFrame:
    li = lineitem
    return li.select(
        F.col("l_orderkey").cast("bigint").alias("rootid"),
        F.col("l_linenumber").cast("bigint").alias("visit"),
        (((F.col("l_orderkey") * 1000000 + F.col("l_partkey")) * 100000 + F.col("l_suppkey")) * 10 + F.col("l_linenumber")).cast("bigint").alias("srcid"),
        (F.col("l_suppkey") % 3).cast("int").alias("priority"),
        F.col("l_returnflag").alias("band"),
        (F.lit(60000.0) + (F.col("l_partkey") % 1000).cast("double") * 0.1).alias("midpointmjdtai"),
        (F.col("l_extendedprice") / 10.0).alias("psfflux"),
        (F.lit(1.0) + F.col("l_tax") * 10.0).alias("psffluxerr"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_discount").alias("discount"),
        ((F.col("l_partkey") % 3600).cast("double") * 0.1).alias("ra"),
        (((F.col("l_partkey") * 7) % 1200).cast("double") * 0.1 - 60.0).alias("dec"),
    )


#: detections = "bright enough" subset; forced = "measured" subset.
DETECTIONS_PRED_SQL = "quantity > 25.0"
FORCED_PRED_SQL = "discount <= 0.06"


def detections(lineitem: DataFrame) -> DataFrame:
    return photometry(lineitem).filter(F.col("quantity") > 25.0)


def forced(lineitem: DataFrame) -> DataFrame:
    return photometry(lineitem).filter(F.col("discount") <= 0.06)


# --- versioned photometry keyed (rootid=l_partkey, visit=l_linenumber):
#     many rows per key across "base versions" (priority = l_suppkey % 3),
#     used for the priority-fallback dedup -------------------------------------

VERSIONED_SQL = """
SELECT CAST(l_partkey AS BIGINT)                      AS rootid,
       CAST(l_linenumber AS BIGINT)                   AS visit,
       CAST(((l_orderkey * 1000000 + l_partkey) * 100000 + l_suppkey) * 10 + l_linenumber AS BIGINT) AS srcid,
       CAST(l_suppkey % 3 AS INTEGER)                 AS priority,
       l_returnflag                                   AS band,
       60000.0 + CAST(l_orderkey % 1000 AS DOUBLE) * 0.1 AS midpointmjdtai,
       l_extendedprice / 10.0                        AS psfflux,
       1.0 + l_tax * 10.0                             AS psffluxerr
FROM lineitem
"""


def versioned_photometry(lineitem: DataFrame) -> DataFrame:
    li = lineitem
    return li.select(
        F.col("l_partkey").cast("bigint").alias("rootid"),
        F.col("l_linenumber").cast("bigint").alias("visit"),
        (((F.col("l_orderkey") * 1000000 + F.col("l_partkey")) * 100000 + F.col("l_suppkey")) * 10 + F.col("l_linenumber")).cast("bigint").alias("srcid"),
        (F.col("l_suppkey") % 3).cast("int").alias("priority"),
        F.col("l_returnflag").alias("band"),
        (F.lit(60000.0) + (F.col("l_orderkey") % 1000).cast("double") * 0.1).alias("midpointmjdtai"),
        (F.col("l_extendedprice") / 10.0).alias("psfflux"),
        (F.lit(1.0) + F.col("l_tax") * 10.0).alias("psffluxerr"),
    )


# --- broker classification messages keyed (diasourceid=l_orderkey):
#     several (broker, topic) messages per source, duplicated across base
#     versions (base_procver_id = 'bpv' || l_suppkey % 3), JSON info payload —
#     used for the get_broker_info lookup ---------------------------------------

BROKERINFO_SQL = """
SELECT CAST(l_orderkey AS BIGINT)                     AS diasourceid,
       CASE CAST(l_linenumber % 3 AS INTEGER)
            WHEN 0 THEN 'fink' WHEN 1 THEN 'antares' ELSE 'alerce'
       END                                            AS brokername,
       'topic-' || CAST(l_partkey % 2 AS VARCHAR)     AS topic,
       'bpv' || CAST(l_suppkey % 3 AS VARCHAR)        AS base_procver_id,
       CAST(((l_orderkey * 1000000 + l_partkey) * 100000 + l_suppkey) * 10 + l_linenumber AS BIGINT) AS msgid,
       '{"classId": ' || CAST(l_partkey % 100 AS VARCHAR)
         || ', "nvotes": ' || CAST(l_suppkey AS VARCHAR) || '}' AS info
FROM lineitem
"""


def brokerinfo(lineitem: DataFrame) -> DataFrame:
    li = lineitem
    ln3 = (F.col("l_linenumber") % 3).cast("int")
    return li.select(
        F.col("l_orderkey").cast("bigint").alias("diasourceid"),
        F.when(ln3 == 0, "fink")
        .when(ln3 == 1, "antares")
        .otherwise("alerce")
        .alias("brokername"),
        F.concat(F.lit("topic-"), (F.col("l_partkey") % 2).cast("string")).alias(
            "topic"
        ),
        F.concat(F.lit("bpv"), (F.col("l_suppkey") % 3).cast("string")).alias(
            "base_procver_id"
        ),
        (((F.col("l_orderkey") * 1000000 + F.col("l_partkey")) * 100000 + F.col("l_suppkey")) * 10 + F.col("l_linenumber")).cast("bigint").alias(
            "msgid"
        ),
        F.concat(
            F.lit('{"classId": '),
            (F.col("l_partkey") % 100).cast("string"),
            F.lit(', "nvotes": '),
            F.col("l_suppkey").cast("string"),
            F.lit("}"),
        ).alias("info"),
    )


# --- sky positions derived from part (for cone search / crossmatch) ----------

PART_SKY_SQL = """
SELECT CAST(p_partkey AS BIGINT)                        AS id,
       CAST((p_partkey * 53) % 3600 AS DOUBLE) * 0.1    AS ra,
       CAST((p_partkey * 37) % 1200 AS DOUBLE) * 0.1 - 60.0 AS "dec"
FROM part
"""

CUSTOMER_SKY_SQL = """
SELECT CAST(c_custkey AS BIGINT)                        AS id,
       CAST((c_custkey * 59) % 3600 AS DOUBLE) * 0.1    AS ra,
       CAST((c_custkey * 41) % 1200 AS DOUBLE) * 0.1 - 60.0 AS "dec"
FROM customer
"""


def part_sky(part: DataFrame) -> DataFrame:
    return part.select(
        F.col("p_partkey").cast("bigint").alias("id"),
        (((F.col("p_partkey") * 53) % 3600).cast("double") * 0.1).alias("ra"),
        (((F.col("p_partkey") * 37) % 1200).cast("double") * 0.1 - 60.0).alias("dec"),
    )


def customer_sky(customer: DataFrame) -> DataFrame:
    return customer.select(
        F.col("c_custkey").cast("bigint").alias("id"),
        (((F.col("c_custkey") * 59) % 3600).cast("double") * 0.1).alias("ra"),
        (((F.col("c_custkey") * 41) % 1200).cast("double") * 0.1 - 60.0).alias("dec"),
    )
