"""Streaming source/sink builders — the reference's broker backends
(SURVEY §2.1) mapped to Spark's built-in connectors.

| reference backend                  | here                              |
|------------------------------------|-----------------------------------|
| Kafka (pspf/connectors/kafka.py)   | `kafka_source` / `kafka_sink`     |
| File  (pspf/connectors/file.py)    | `file_source` / `file_sink` (JSON)|
| Memory (pspf/connectors/memory.py) | `memory_sink` + rate source       |
| Valkey (pspf/connectors/valkey.py) | sources/valkey.py: wire format,   |
|                                    | XADD-id semantics, DLQ naming as  |
|                                    | pure logic + a Spark 4 Python     |
|                                    | DataSource over XRANGE dumps (no  |
|                                    | broker in this environment)       |

Offsets/consumer groups dissolve into `checkpointLocation`; the
exactly-once consume protocol the reference implements by transactional
state+offset commits (docs/reliability.md:10-18) is the checkpoint's
native behavior.

Kafka needs the spark-sql-kafka package on the classpath; builders
raise a clear error if it's absent (not bundled in this environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """JSON-lines directory source (reference FileStreamBackend)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def file_sink(df: DataFrame, path: str, checkpoint: str, *, fmt: str = "json"):
    """Append sink to a directory; exactly-once via the checkpoint."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source (tests/demos; reference MemoryBackend's role)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def memory_sink(df: DataFrame, name: str, *, output_mode: str = "append"):
    """In-memory queryable sink: `spark.sql(f"SELECT * FROM {name}")`."""
    return df.writeStream.format("memory").queryName(name).outputMode(output_mode)


def _require_kafka(spark: SparkSession) -> None:
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: SLF001
    except Exception as exc:  # pragma: no cover - no kafka jars in env
        raise RuntimeError(
            "Kafka connector jars not on the classpath; start the session "
            "with spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>"
        ) from exc


def parse_kafka_frame(raw: DataFrame, schema: StructType) -> DataFrame:
    """Type a Kafka-shaped frame (key/value binary + topic/partition/
    offset/timestamp — the reference's StreamRecord fields,
    pspf/models.py:5-16): value JSON parsed with `schema`, malformed
    values preserved in `_corrupt` for DLQ routing. Pure plan function
    so the wire-format logic is testable without a broker."""
    val = F.col("value").cast("string")
    valid = F.try_parse_json(val).isNotNull()
    parsed = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
        F.when(valid, F.from_json(val, schema)).alias("event"),
        F.when(~valid, val).alias("_corrupt"),
    )
    return parsed.select(
        "key", "topic", "partition", "offset", "timestamp", "event.*", "_corrupt"
    )


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Build the Kafka reader option map — pure function so the
    backpressure plumbing is unit-testable without a broker.

    `max_offsets_per_trigger` is the Kafka-path backpressure knob
    (rate-limits records per micro-batch across all partitions), the
    parity of the file path's `maxFilesPerTrigger` and the reference's
    batch-size tuning (pspf/settings.py:36-38).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:  # pragma: no cover - needs a broker
    """Kafka topic -> typed DataFrame via `parse_kafka_frame`."""
    _require_kafka(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        bootstrap_servers,
        topic,
        starting_offsets=starting_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
    ).items():
        reader = reader.option(k, v)
    return parse_kafka_frame(reader.load(), schema)


def to_kafka_frame(df: DataFrame, key_col: str | None = "event_id") -> DataFrame:
    """Project a typed frame to the Kafka wire shape (key, value JSON),
    keyed by `key_col` (the reference keys produced messages by
    event_id, pspf/connectors/kafka.py:105-122). Pure plan function —
    testable without a broker; `parse_kafka_frame` inverts it."""
    cols = list(df.columns)
    return df.select(
        (F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
    )


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    *,
    key_col: str | None = "event_id",
):  # pragma: no cover - needs a broker
    """DataFrame -> Kafka JSON sink via `to_kafka_frame`."""
    return (
        to_kafka_frame(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


