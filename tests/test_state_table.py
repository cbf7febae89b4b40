"""Interactive state serving: streaming agg materialized to a keyed
table, point lookups after every batch (reference GET /state/{key})."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from python_stream_processing_framework_spark.streaming.state_table import StateTable

SCHEMA = StructType(
    [StructField("key", StringType()), StructField("v", LongType())]
)


def _write(src, name, rows):
    (src / f"{name}.json").write_text(
        "\n".join(json.dumps({"key": k, "v": v}) for k, v in rows) + "\n"
    )


def test_state_table_upsert_and_lookup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    table = StateTable(spark, str(tmp_path / "state"), "key")

    def run():
        agg = (
            spark.readStream.schema(SCHEMA)
            .json(str(src))
            .groupBy("key")
            .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        )
        q = (
            agg.writeStream.foreachBatch(table.writer())
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write(src, "b1", [("a", 5), ("a", 7), ("b", 1)])
    run()
    assert table.get("a")["total"] == 12
    assert table.get("b")["n"] == 1
    assert table.get("zzz") is None

    _write(src, "b2", [("a", 3), ("c", 9)])
    run()
    assert table.get("a")["total"] == 15  # upserted, not duplicated
    assert table.get("c")["total"] == 9
    assert table.snapshot().count() == 3
