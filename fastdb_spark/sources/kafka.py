"""Kafka avro stream builders (SURVEY.md S1/S10; reference
``src/kafka_consumer.py:261-409``, ``src/services/projectsim.py:213-714``).

The spark-avro and spark-sql-kafka jars are not in the test image, so the
builders are import/classpath-gated: they CONSTRUCT the reader/writer
(proving the plan shape) but raise a clear error when the packages are
absent.  The nested frame they produce/consume is exactly
``sources.alerts.ALERT_SCHEMA`` — the file-based transport used in tests
is drop-in interchangeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require_avro(spark: SparkSession):
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401

        return from_avro, to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro is not on the classpath in this image; add "
            "org.apache.spark:spark-avro to spark.jars.packages"
        ) from e


def read_alert_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    avro_schema_json: str,
    max_offsets_per_trigger: int = 1000,
) -> DataFrame:
    """Kafka -> nested alert frame.

    Micro-batch sizing mirrors the reference's 1000-message polls (T1);
    consumer-group offsets are replaced by the streaming checkpoint (T2).
    """
    from_avro, _ = _require_avro(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .option("startingOffsets", "earliest")
        .load()
    )
    return raw.select(
        from_avro(raw["value"], avro_schema_json).alias("alert")
    ).select("alert.*")


def write_alert_stream(
    alerts: DataFrame,
    bootstrap_servers: str,
    topic: str,
    avro_schema_json: str,
    checkpoint: str,
):
    """Nested alert frame -> avro -> Kafka (the projectsim send path)."""
    _, to_avro = _require_avro(alerts.sparkSession)
    import pyspark.sql.functions as F

    payload = alerts.select(
        to_avro(F.struct(*alerts.columns), avro_schema_json).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
