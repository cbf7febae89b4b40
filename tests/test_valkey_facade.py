"""Facade-level Valkey bridges (Stream.ingest_valkey /
Stream.deliver_valkey): a live Valkey-protocol stream feeds the
broker exactly-once, and a broker topic delivers out through the
distributed pipelined XADD sink — the facade form of the reference's
default-broker deployment (pspf/connectors/valkey.py). Runs against
$VALKEY_URL when set, else the embedded MiniValkeyServer; real
executor sockets either way."""

from __future__ import annotations

import pytest

import json
import uuid

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.sources.valkey import flatten_entry

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("k", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _events(lo: int, hi: int) -> list[dict]:
    return [
        {"event_id": f"e{i}", "k": i % 5, "value": float(i)} for i in range(lo, hi)
    ]


@pytest.mark.slow
def test_ingest_valkey_exactly_once_across_runs(spark, tmp_path, valkey_client, valkey_url):
    """XADD -> ingest bridge -> pipeline -> sink: every entry lands
    exactly once, and a SECOND run after more XADDs ingests only the
    new entries (checkpointed entry-id offsets)."""
    from python_stream_processing_framework_spark.streaming import Stream

    skey = f"fin-{uuid.uuid4().hex[:10]}"
    for ev in _events(0, 10):
        valkey_client.xadd(skey, flatten_entry(ev))

    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.ingest_valkey(valkey_url, skey, topic="in")

    def double(ev):
        return {**ev, "value": ev["value"] * 2}

    stream.pipeline("in", SCHEMA).map(double).sink("out")
    # round 1 ingests; round 2 lets the pipeline see the new files
    # (availableNow pins its file list at start — same draining
    # pattern as handler re-emits)
    stream.run_until_idle(rounds=2)

    out = {
        (r["event_id"], r["value"])
        for r in stream.read_topic("out", SCHEMA).collect()
    }
    assert out == {(f"e{i}", float(i) * 2) for i in range(10)}

    for ev in _events(10, 15):
        valkey_client.xadd(skey, flatten_entry(ev))
    stream.run_until_idle(rounds=2)
    out2 = [
        (r["event_id"], r["value"])
        for r in stream.read_topic("out", SCHEMA).collect()
    ]
    # 15 distinct events, ZERO duplicates of the first batch
    assert len(out2) == 15
    assert set(out2) == {(f"e{i}", float(i) * 2) for i in range(15)}
    valkey_client.delete(skey)


def test_deliver_valkey_distributed_xadd(spark, tmp_path, valkey_client, valkey_url):
    """emit -> deliver bridge -> live stream: every event XADDed,
    payloads round-trip through the wire format."""
    from python_stream_processing_framework_spark.streaming import Stream

    skey = f"fout-{uuid.uuid4().hex[:10]}"
    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.emit("t", *_events(0, 12))
    stream.deliver_valkey("t", SCHEMA, valkey_url, skey)
    stream.run_until_idle()

    entries = valkey_client.xrange(skey)
    assert len(entries) == 12
    got = {f["event_id"]: float(f["value"]) for _id, f in entries}
    assert got == {f"e{i}": float(i) for i in range(12)}
    valkey_client.delete(skey)


def test_roundtrip_valkey_in_and_out(spark, tmp_path, valkey_client, valkey_url):
    """Full edge-to-edge: live stream in -> facade filter -> live
    stream out. The facade is the exactly-once substrate between two
    broker edges."""
    from python_stream_processing_framework_spark.streaming import Stream

    src_key = f"rin-{uuid.uuid4().hex[:10]}"
    dst_key = f"rout-{uuid.uuid4().hex[:10]}"
    for ev in _events(0, 10):
        valkey_client.xadd(src_key, flatten_entry(ev))

    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.ingest_valkey(valkey_url, src_key, topic="in")
    stream.pipeline("in", SCHEMA).filter(lambda ev: ev["k"] == 0).sink("keep")
    stream.deliver_valkey("keep", SCHEMA, valkey_url, dst_key)
    stream.run_until_idle(rounds=3)

    entries = valkey_client.xrange(dst_key)
    assert {f["event_id"] for _id, f in entries} == {"e0", "e5"}
    valkey_client.delete(src_key, dst_key)


def test_idempotent_sink_retry_writes_nothing_twice(spark, valkey_client, valkey_url):
    """The exactly-once producer: re-delivering the SAME batch_id is
    a no-op (every id rejected server-side as already delivered);
    the NEXT batch_id appends. Partial-failure retry: delivering a
    prefix first, then the full batch, delivers exactly the
    missing suffix."""
    import uuid as _uuid

    from python_stream_processing_framework_spark.sources.valkey import (
        valkey_stream_sink_idempotent,
        xadd_rows_idempotent,
    )

    skey = f"ido-{_uuid.uuid4().hex[:10]}"
    df = spark.createDataFrame(
        [(f"e{i}", float(i)) for i in range(8)], ["event_id", "value"]
    )
    valkey_stream_sink_idempotent(df, valkey_url, skey, batch_id=0)
    assert valkey_client.xlen(skey) == 8
    # full retry of batch 0: nothing new
    valkey_stream_sink_idempotent(df, valkey_url, skey, batch_id=0)
    assert valkey_client.xlen(skey) == 8
    # batch 1 appends
    valkey_stream_sink_idempotent(df, valkey_url, skey, batch_id=1)
    assert valkey_client.xlen(skey) == 16
    # entry ids are the deterministic (BASE+batch)-(seq) form and the
    # payloads round-trip
    ids = [eid for eid, _f in valkey_client.xrange(skey)]
    assert len(set(ids)) == 16
    assert all(int(eid.split("-")[0]) >= 9_000_000_000_000_000 for eid in ids)
    valkey_client.delete(skey)

    # partial-failure retry at the row level: prefix then full
    skey2 = f"idp-{_uuid.uuid4().hex[:10]}"
    rows = [{"event_id": f"e{i}", "value": float(i)} for i in range(6)]
    d1, s1 = xadd_rows_idempotent(valkey_client, skey2, rows[:4], batch_id=7)
    assert (d1, s1) == (4, 0)
    d2, s2 = xadd_rows_idempotent(valkey_client, skey2, rows, batch_id=7)
    assert (d2, s2) == (2, 4)  # exactly the missing suffix delivered
    assert valkey_client.xlen(skey2) == 6
    valkey_client.delete(skey2)


def test_deliver_valkey_exactly_once_mode(spark, tmp_path, valkey_client, valkey_url):
    """Facade-level exactly-once delivery: deterministic ids on the
    wire, every event exactly once."""
    import uuid as _uuid

    from python_stream_processing_framework_spark.streaming import Stream

    skey = f"xo-{_uuid.uuid4().hex[:10]}"
    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.emit("t", *_events(0, 9))
    stream.deliver_valkey("t", SCHEMA, valkey_url, skey, exactly_once=True)
    stream.run_until_idle()

    entries = valkey_client.xrange(skey)
    assert len(entries) == 9
    assert {f["event_id"] for _id, f in entries} == {f"e{i}" for i in range(9)}
    assert all(
        int(eid.split("-")[0]) >= 9_000_000_000_000_000 for eid, _f in entries
    )
    valkey_client.delete(skey)


def test_sharded_idempotent_sink_exactly_once_across_shards(
    spark, valkey_client, valkey_url
):
    """The sharded exactly-once producer: every row lands in exactly
    one of the N shard streams, a full-batch retry delivers nothing
    anywhere, a partial-crash retry (prefix of one shard's sorted
    sequence landed) heals per shard, and the next batch appends."""
    import uuid as _uuid

    from python_stream_processing_framework_spark.sources.valkey import (
        valkey_stream_sink_idempotent_sharded,
    )

    skey = f"sho-{_uuid.uuid4().hex[:10]}"
    n_shards, n_rows = 3, 40
    df = spark.createDataFrame(
        [(f"e{i}", float(i)) for i in range(n_rows)], ["event_id", "value"]
    )

    def shard_entries():
        return {
            s: valkey_client.xrange(f"{skey}:{s}") for s in range(n_shards)
        }

    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, skey, batch_id=0, num_shards=n_shards
    )
    ents = shard_entries()
    all_ids = [f["event_id"] for s in ents for _eid, f in ents[s]]
    assert sorted(all_ids) == sorted(f"e{i}" for i in range(n_rows))
    assert len(all_ids) == n_rows  # exactly once, no shard overlap
    assert all(len(ents[s]) > 0 for s in range(n_shards))  # actually spread

    # full redelivery of batch 0: zero new entries on every shard
    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, skey, batch_id=0, num_shards=n_shards
    )
    assert sum(valkey_client.xlen(f"{skey}:{s}") for s in range(n_shards)) == n_rows

    # batch 1 appends exactly once more
    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, skey, batch_id=1, num_shards=n_shards
    )
    assert (
        sum(valkey_client.xlen(f"{skey}:{s}") for s in range(n_shards))
        == 2 * n_rows
    )
    for s in range(n_shards):
        valkey_client.delete(f"{skey}:{s}")


def test_sharded_sink_shard_by_keeps_key_in_one_shard(
    spark, valkey_client, valkey_url
):
    """shard_by pins all rows of a key to one shard (per-key total
    order, the partition-key semantic) and stays deterministic
    across retries."""
    import uuid as _uuid

    from python_stream_processing_framework_spark.sources.valkey import (
        valkey_stream_sink_idempotent_sharded,
    )

    skey = f"shk-{_uuid.uuid4().hex[:10]}"
    n_shards = 4
    df = spark.createDataFrame(
        [(f"e{i}", i % 6, float(i)) for i in range(48)],
        ["event_id", "k", "value"],
    )
    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, skey, batch_id=0, num_shards=n_shards, shard_by="k"
    )
    key_shards: dict[str, set[int]] = {}
    total = 0
    for s in range(n_shards):
        for _eid, f in valkey_client.xrange(f"{skey}:{s}"):
            key_shards.setdefault(f["k"], set()).add(s)
            total += 1
    assert total == 48
    assert all(len(shards) == 1 for shards in key_shards.values()), key_shards
    for s in range(n_shards):
        valkey_client.delete(f"{skey}:{s}")


def test_deliver_valkey_sharded_facade(spark, tmp_path, valkey_client, valkey_url):
    """Facade-level sharded exactly-once delivery: num_shards routes
    through the sharded sink; union of shard streams carries every
    event exactly once with deterministic ids."""
    import uuid as _uuid

    from python_stream_processing_framework_spark.streaming import Stream

    skey = f"shf-{_uuid.uuid4().hex[:10]}"
    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.emit("t", *_events(0, 12))
    stream.deliver_valkey(
        "t", SCHEMA, valkey_url, skey, exactly_once=True, num_shards=2,
        shard_by="k",
    )
    stream.run_until_idle()

    seen = []
    for s in range(2):
        for eid, f in valkey_client.xrange(f"{skey}:{s}"):
            assert int(eid.split("-")[0]) >= 9_000_000_000_000_000
            seen.append(f["event_id"])
    assert sorted(seen) == sorted(f"e{i}" for i in range(12))
    assert len(seen) == 12
    for s in range(2):
        valkey_client.delete(f"{skey}:{s}")


def test_sharded_sink_crash_between_shard_writes_heals(
    spark, valkey_client, valkey_url
):
    """The sharded sink's crash window (r12 adversarial battery): a
    task writes its shards SEQUENTIALLY, so a kill between shard N's
    XADD pipeline and shard N+1's leaves shard N complete, shard N+1
    a prefix (or absent). A full-batch redelivery must then
    double-write nothing: every shard ends with exactly its
    deterministic sorted sequence under the deterministic entry
    ids."""
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.sources.valkey import (
        DETERMINISTIC_ID_BASE,
        valkey_stream_sink_idempotent_sharded,
        xadd_rows_idempotent,
    )

    skey = f"shc-{uuid.uuid4().hex[:10]}"
    n_shards, n_rows, batch = 3, 30, 5
    df = spark.createDataFrame(
        [(f"e{i}", float(i)) for i in range(n_rows)], ["event_id", "value"]
    )
    # the sink's exact assignment + order rule, recomputed independently
    exp_rows = (
        df.withColumn("_ek", F.md5(F.to_json(F.struct("event_id", "value"))))
        .withColumn(
            "_shard", F.pmod(F.xxhash64(F.col("_ek")), F.lit(n_shards))
        )
        .orderBy("_shard", "_ek")
        .collect()
    )
    seqs: dict[int, list[dict]] = {s: [] for s in range(n_shards)}
    for r in exp_rows:
        seqs[r["_shard"]].append(
            {"event_id": r["event_id"], "value": r["value"]}
        )
    assert all(len(seqs[s]) >= 4 for s in range(n_shards))  # real spread

    # simulate the mid-task crash: shard 0 fully delivered, shard 1 a
    # 3-row prefix, shard 2 untouched — then the task dies
    xadd_rows_idempotent(
        valkey_client, f"{skey}:0", iter(seqs[0]), batch_id=batch
    )
    xadd_rows_idempotent(
        valkey_client, f"{skey}:1", iter(seqs[1][:3]), batch_id=batch
    )

    # the whole batch redelivers (Structured Streaming's retry unit)
    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, skey, batch_id=batch, num_shards=n_shards
    )
    base = DETERMINISTIC_ID_BASE + batch
    for s in range(n_shards):
        entries = valkey_client.xrange(f"{skey}:{s}")
        assert [f["event_id"] for _eid, f in entries] == [
            r["event_id"] for r in seqs[s]
        ], f"shard {s} sequence diverged or double-wrote"
        assert [eid for eid, _f in entries] == [
            f"{base}-{i}" for i in range(len(seqs[s]))
        ], f"shard {s} ids not the contiguous deterministic sequence"
        valkey_client.delete(f"{skey}:{s}")


def test_sharded_sink_placement_is_exactly_the_hash_rule(
    spark, valkey_client, valkey_url
):
    """Cross-shard row placement matches the documented pure-content
    rule row-for-row (not merely 'each key in one shard'):
    pmod(xxhash64(shard_by cast to string), N) with shard_by, and
    pmod(xxhash64(md5(to_json(struct(*cols)))), N) without."""
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.sources.valkey import (
        valkey_stream_sink_idempotent_sharded,
    )

    n_shards = 4
    df = spark.createDataFrame(
        [(f"e{i}", i % 7, float(i)) for i in range(56)],
        ["event_id", "k", "value"],
    )

    def landed(prefix: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in range(n_shards):
            for _eid, f in valkey_client.xrange(f"{prefix}:{s}"):
                assert f["event_id"] not in out
                out[f["event_id"]] = s
            valkey_client.delete(f"{prefix}:{s}")
        return out

    k1 = f"shp-{uuid.uuid4().hex[:10]}"
    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, k1, batch_id=0, num_shards=n_shards, shard_by="k"
    )
    want_by_key = {
        r["event_id"]: r["s"]
        for r in df.select(
            "event_id",
            F.pmod(
                F.xxhash64(F.col("k").cast("string")), F.lit(n_shards)
            ).alias("s"),
        ).collect()
    }
    assert landed(k1) == want_by_key

    k2 = f"shd-{uuid.uuid4().hex[:10]}"
    valkey_stream_sink_idempotent_sharded(
        df, valkey_url, k2, batch_id=0, num_shards=n_shards
    )
    want_by_digest = {
        r["event_id"]: r["s"]
        for r in df.select(
            "event_id",
            F.pmod(
                F.xxhash64(F.md5(F.to_json(F.struct("event_id", "k", "value")))),
                F.lit(n_shards),
            ).alias("s"),
        ).collect()
    }
    assert landed(k2) == want_by_digest
