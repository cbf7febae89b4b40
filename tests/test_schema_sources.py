"""Schema registry dispatch, evolution, source registry, telemetry,
windowed fold, CLI — the remaining SURVEY §2 parity surfaces."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.schema import (
    BASE_EVENT_SCHEMA,
    SchemaRegistry,
    evolve,
)
from python_stream_processing_framework_spark.sources import registry
from python_stream_processing_framework_spark.streaming.state import windowed_fold
from python_stream_processing_framework_spark.streaming.windows import (
    SessionWindow,
    SlidingWindow,
    TumblingWindow,
)


def test_schema_registry_dispatch_and_corrupt(spark):
    reg = SchemaRegistry()
    reg.register(
        "order",
        StructType(
            [
                StructField("event_type", StringType()),
                StructField("order_id", LongType()),
                StructField("amount", DoubleType()),
            ]
        ),
    )
    raw = spark.createDataFrame(
        [
            ('{"event_type": "order", "order_id": 1, "amount": 9.5}',),
            ('{"event_type": "order", "order_id": 2, "amount": 1.0}',),
            ('{"event_type": "ping", "event_id": "x"}',),  # fallback schema
            ("{not json at all",),  # corrupt
        ],
        ["value"],
    )
    frames, corrupt = reg.parse(raw)
    orders = {r["order_id"]: r["amount"] for r in frames["order"].collect()}
    assert orders == {1: 9.5, 2: 1.0}
    fallback = frames["_fallback"].collect()
    assert len(fallback) == 1 and fallback[0]["event_id"] == "x"
    bad = corrupt.collect()
    assert len(bad) == 1 and bad[0]["raw"].startswith("{not")


def test_schema_evolution(spark):
    old = spark.createDataFrame([(1, "a")], ["id", "name"])
    target = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),  # new nullable column
        ]
    )
    row = evolve(old, target).collect()[0]
    assert (row["id"], row["name"], row["score"]) == (1, "a", None)
    assert [f.name for f in evolve(old, target).schema.fields] == ["id", "name", "score"]


def test_source_registry():
    assert {"file", "memory", "kafka", "valkey"} <= set(registry.names())
    with pytest.raises(ValueError):
        registry.register("file", doc="dup")
    with pytest.raises(KeyError, match="unknown backend"):
        registry.get("no-such-broker")
    assert registry.load_entry_points() == 0  # no external plugins here


def test_windowed_fold_tumbling_and_sliding(spark):
    def fold(event, state):
        state = state or {"n": 0, "total": 0.0}
        return {"n": state["n"] + 1, "total": state["total"] + event["value"]}

    df = spark.createDataFrame(
        [("u", 1.0, 5.0), ("u", 5.0, 10.0), ("u", 12.0, 7.0)],
        ["key", "ts", "value"],
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))

    out = {
        (r["key"], r["win_start_us"]): json.loads(r["state_json"])
        for r in windowed_fold(df, "key", "ts", TumblingWindow(10_000), fold).collect()
    }
    assert out[("u", 0)] == {"n": 2, "total": 15.0}
    assert out[("u", 10_000_000)] == {"n": 1, "total": 7.0}

    # sliding 10s/5s: each event lands in two windows
    sl = windowed_fold(df, "key", "ts", SlidingWindow(10_000, 5_000), fold).collect()
    starts = {(r["win_start_us"], json.loads(r["state_json"])["n"]) for r in sl}
    assert (0, 2) in starts  # [0,10): events at 1,5
    assert (-5_000_000, 1) in starts  # [-5,5): event at 1
    assert (5_000_000, 2) in starts  # [5,15): events at 5,12

    with pytest.raises(NotImplementedError):
        windowed_fold(df, "key", "ts", SessionWindow(5_000), fold)


def test_metrics_recorder(spark, tmp_path):
    from python_stream_processing_framework_spark import telemetry

    rec = telemetry.attach(spark)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"k": "a", "v": 1}\n{"k": "b", "v": 2}\n')
    schema = StructType([StructField("k", StringType()), StructField("v", LongType())])
    q = (
        spark.readStream.schema(schema)
        .json(str(src))
        .groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("m_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # listener delivery is async; give it a beat
    import time

    for _ in range(20):
        if rec.total_rows() >= 2:
            break
        time.sleep(0.25)
    assert rec.total_rows() >= 2
    assert any(p.get("num_input_rows") for p in rec.snapshot().values())

    # Prometheus surface over the same recorder: exposition text + the
    # live /metrics endpoint (reference ships a prometheus_client
    # exporter + grafana dashboards; examples/grafana mirrors that
    # against these metric names).
    from python_stream_processing_framework_spark.telemetry import (
        prometheus_exposition,
    )

    text = prometheus_exposition(rec)
    assert "# TYPE pspf_stream_rows_total counter" in text
    assert "pspf_stream_input_rows{" in text
    assert 'query="m_out"' in text

    import urllib.request

    from python_stream_processing_framework_spark.api import StateApiServer
    from python_stream_processing_framework_spark.streaming.state_table import (
        StateTable,
    )

    table = StateTable(spark, str(tmp_path / "state"), "key", buckets=2)
    api = StateApiServer(table, metrics=rec).start()
    try:
        resp = urllib.request.urlopen(f"http://{api.host}:{api.port}/metrics")
        assert resp.headers["Content-Type"].startswith("text/plain")
        body = resp.read().decode()
        assert "pspf_stream_rows_total" in body
    finally:
        api.stop()
    spark.streams.removeListener(rec)


def test_cli_dlq_tools(tmp_path, capsys):
    from python_stream_processing_framework_spark import cli

    broker = tmp_path / "broker"
    dlq = broker / "jobs-dlq"
    dlq.mkdir(parents=True)
    (dlq / "x.json").write_text(
        json.dumps({"event_id": "e1", "value": 1.0, "_error": "boom"}) + "\n"
    )

    cli.main(["dlq-inspect", "--broker", str(broker), "--topic", "jobs"])
    out = capsys.readouterr().out
    assert "1 message(s)" in out and "boom" in out

    cli.main(["dlq-replay", "--broker", str(broker), "--topic", "jobs"])
    assert "replayed 1" in capsys.readouterr().out
    replayed = list((broker / "jobs").glob("*.json"))
    assert len(replayed) == 1
    row = json.loads(replayed[0].read_text().strip())
    assert row == {"event_id": "e1", "value": 1.0}  # _error stripped
    assert not list(dlq.glob("*.json"))

    cli.main(["dlq-purge", "--broker", str(broker), "--topic", "jobs"])
    assert "purged 0" in capsys.readouterr().out


def test_cli_inspect_groups_reset(tmp_path, capsys):
    """Operational parity with the reference CLI (pspf/cli.py:18-135):
    inspect reads topic records with offsets and a tail window; groups
    lists checkpoint-backed consumer groups with committed batches;
    reset removes a group's checkpoint (offset-0 reprocess)."""
    from python_stream_processing_framework_spark import cli

    broker = tmp_path / "broker"
    topic = broker / "jobs"
    topic.mkdir(parents=True)
    (topic / "a.json").write_text(
        "\n".join(
            json.dumps({"event_id": f"e{i}", "key": "k", "timestamp": float(i)})
            for i in range(5)
        )
        + "\n"
    )

    cli.main(["inspect", "--broker", str(broker), "--topic", "jobs", "--limit", "2"])
    out = capsys.readouterr().out
    assert "High Watermark = 5" in out and "[0]" in out and "e1" in out

    cli.main(["inspect", "--broker", str(broker), "--topic", "jobs",
              "--limit", "2", "--tail"])
    out = capsys.readouterr().out
    assert "[3]" in out and "e4" in out and "e0" not in out

    # a fake committed checkpoint: {topic}-{group}/commits/{0,1}
    commits = broker / "_checkpoints" / "jobs-workers" / "commits"
    commits.mkdir(parents=True)
    (commits / "0").write_text("v1")
    (commits / "1").write_text("v1")
    cli.main(["groups", "--broker", str(broker)])
    out = capsys.readouterr().out
    assert "jobs-workers" in out
    assert "committed batches: 2" in out and "latest batch id: 1" in out

    cli.main(["groups", "--broker", str(broker), "--topic", "nope"])
    assert "no consumer groups" in capsys.readouterr().out

    cli.main(["reset", "--broker", str(broker), "--topic", "jobs",
              "--group", "workers"])
    assert "reset group" in capsys.readouterr().out
    assert not (broker / "_checkpoints" / "jobs-workers").exists()
    cli.main(["reset", "--broker", str(broker), "--topic", "jobs",
              "--group", "workers"])
    assert "no checkpoint" in capsys.readouterr().out


def test_cli_status_commands(spark, tmp_path, capsys):
    """status / cluster-status against a live worker API; a stopped
    worker is reported unhealthy (HTTP 503)."""
    from python_stream_processing_framework_spark import cli
    from python_stream_processing_framework_spark.api import StateApiServer
    from python_stream_processing_framework_spark.streaming.state_table import (
        StateTable,
    )

    table = StateTable(spark, str(tmp_path / "state"), "key", buckets=4)
    table.upsert(spark.createDataFrame([("a", 1)], ["key", "n"]))
    api = StateApiServer(table).start()
    url = f"http://{api.host}:{api.port}"
    try:
        cli.main(["status", "--url", url])
        assert "worker online" in capsys.readouterr().out

        cli.main(["cluster-status", "--url", url])
        out = capsys.readouterr().out
        assert "node:" in out and "held partitions" in out
    finally:
        api.stop()
    cli.main(["status", "--url", url])
    out = capsys.readouterr().out
    assert "online" not in out  # stopped -> unhealthy or unreachable


def test_cli_search(capsys):
    """`pspf-spark search` runs BM25 over a documents parquet and
    prints ranked hits with snippets."""
    from python_stream_processing_framework_spark import cli

    cli.main(
        [
            "search",
            "--data",
            "/root/testdata/sf0.001",
            "--query",
            "window join",
            "--k",
            "3",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    scores = [float(line.split()[1]) for line in out]
    assert scores == sorted(scores, reverse=True)


def test_prometheus_exposition_escapes_labels():
    """Exposition-format label escaping: backslash, quote, newline.
    One unescaped value breaks the WHOLE scrape (every metric lost)."""
    from python_stream_processing_framework_spark.telemetry import (
        prometheus_exposition,
    )

    class FakeRec:
        def snapshot(self):
            return {
                'id"1': {
                    "name": 'win\\10m "hot"\nline',
                    "batch_id": 3,
                    "num_input_rows": 7,
                }
            }

        def total_rows(self):
            return 7

    text = prometheus_exposition(FakeRec())
    assert 'query="win\\\\10m \\"hot\\"\\nline"' in text
    assert 'id="id\\"1"' in text
    assert "\nline" not in text.replace("\\n", "")  # no raw newline inside a label


def test_cli_trim_retention(tmp_path, capsys):
    """`trim --keep N` deletes the oldest emit-files beyond N (the
    XTRIM/maxlen analog), counting deleted messages; newer files and
    a running consumer's semantics are untouched (old-file deletion is
    the safe direction for the file source)."""
    import os
    import time as _time

    from python_stream_processing_framework_spark import cli

    topic = tmp_path / "broker" / "events"
    topic.mkdir(parents=True)
    for i in range(5):
        f = topic / f"msg-{i}.json"
        f.write_text('{"n": %d}\n{"n": %d}\n' % (i, i))
        # distinct mtimes so oldest-first ordering is deterministic
        t = _time.time() - (10 - i)
        os.utime(f, (t, t))

    cli.main(["trim", "--broker", str(tmp_path / "broker"),
              "--topic", "events", "--keep", "2"])
    out = capsys.readouterr().out
    assert "trimmed 3 files (6 messages)" in out and "2 files kept" in out
    assert sorted(p.name for p in topic.glob("*.json")) == [
        "msg-3.json", "msg-4.json",
    ]


def test_cli_trim_rejects_negative_keep(tmp_path):
    import pytest as _pytest

    from python_stream_processing_framework_spark import cli

    (tmp_path / "broker" / "events").mkdir(parents=True)
    with _pytest.raises(SystemExit, match="must be >= 0"):
        cli.main(["trim", "--broker", str(tmp_path / "broker"),
                  "--topic", "events", "--keep", "-1"])
