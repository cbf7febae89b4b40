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


def test_state_lookup_prunes_to_bucket(spark, tmp_path):
    """The point-lookup plan must partition-prune to the key's bucket
    directory (reference routes lookups to the partition leader,
    cluster_api.py:42) — not list/scan the whole table."""
    table = StateTable(spark, str(tmp_path / "state"), "key", buckets=8)
    rows = [(f"k{i}", i) for i in range(50)]
    table.upsert(spark.createDataFrame(rows, ["key", "total"]))

    assert table.get("k7")["total"] == 7
    plan = (
        spark.read.parquet(table.path)
        .filter(F.col("_bucket") == table.bucket_of("k7"))
        .filter(F.col("key") == "k7")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert f"_bucket#" in plan  # partition filter present
    # engine bucket == driver-side crc32 bucket for every key
    engine = {
        r["key"]: r["_bucket"]
        for r in spark.read.parquet(table.path).select("key", "_bucket").collect()
    }
    assert engine == {k: table.bucket_of(k) for k, _ in rows}


def test_upsert_leaves_untouched_buckets_byte_identical(spark, tmp_path):
    """An upsert must rewrite ONLY the buckets the batch touches
    (dynamic partition overwrite): at 100 TB the state table dwarfs
    any micro-batch, so a full-table rewrite per batch is the
    topology's bottleneck. Untouched buckets' parquet files must
    remain byte-identical — same paths, same bytes."""
    from pathlib import Path

    table = StateTable(spark, str(tmp_path / "state"), "key", buckets=8)
    table.upsert(spark.createDataFrame([(f"k{i}", i) for i in range(50)], ["key", "total"]))

    def files_by_bucket():
        out = {}
        for p in Path(table.path).rglob("*.parquet"):
            bucket = next(
                part.split("=")[1] for part in p.parts if part.startswith("_bucket=")
            )
            out.setdefault(int(bucket), {})[str(p)] = p.read_bytes()
        return out

    before = files_by_bucket()
    touched_bucket = table.bucket_of("k7")
    table.upsert(spark.createDataFrame([("k7", 700)], ["key", "total"]))
    after = files_by_bucket()

    assert table.get("k7")["total"] == 700
    assert table.get("k8")["total"] == 8  # sibling data intact
    for bucket, files in before.items():
        if bucket == touched_bucket:
            continue
        assert after[bucket] == files, f"bucket {bucket} was rewritten"
    assert after[touched_bucket] != before[touched_bucket]


def test_state_api_server(spark, tmp_path):
    """Live-server parity with the reference cluster API
    (pspf/api/cluster_api.py:23-106): /health, /state/{key} hit and
    miss, /cluster/status."""
    import urllib.error
    import urllib.request

    from python_stream_processing_framework_spark.api import StateApiServer

    table = StateTable(spark, str(tmp_path / "state"), "key", buckets=4)
    table.upsert(spark.createDataFrame([("a", 12), ("b", 1)], ["key", "total"]))
    api = StateApiServer(table).start()
    base = f"http://{api.host}:{api.port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/health").read())
        assert health == {"status": "ok", "worker_state": "running"}

        hit = json.loads(urllib.request.urlopen(f"{base}/state/a").read())
        assert hit["key"] == "a" and hit["value"]["total"] == 12

        try:
            urllib.request.urlopen(f"{base}/state/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "not found" in json.loads(e.read())["detail"]

        status = json.loads(urllib.request.urlopen(f"{base}/cluster/status").read())
        assert status["ha_enabled"] is False
        assert status["node_id"]
        assert len(status["held_partitions"]) == 4
    finally:
        api.stop()


def test_state_api_integer_key_coercion(spark, tmp_path):
    """/state/42 must match a bigint key column (URL segments arrive
    as strings)."""
    import urllib.request

    from python_stream_processing_framework_spark.api import StateApiServer

    table = StateTable(spark, str(tmp_path / "state"), "user_id", buckets=4)
    table.upsert(spark.createDataFrame([(42, 7)], ["user_id", "n"]))
    api = StateApiServer(table).start()
    try:
        got = json.loads(
            urllib.request.urlopen(f"http://{api.host}:{api.port}/state/42").read()
        )
        assert got["value"]["n"] == 7
    finally:
        api.stop()
