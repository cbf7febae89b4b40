"""Full-composition end-to-end: the training-data pipeline shape a
real deployment runs, chained through FOUR facade stages over live
broker sockets —

    live Valkey stream --ingest_valkey--> broker topic
      --dedupe_near--> near-dup-free topic
      --decontaminate--> clean topic (+ flagged audit topic)
      --deliver_valkey(exactly_once, sharded)--> N live shard streams

Every stage keeps its own checkpoint + idempotent sink discipline, so
the SECOND wave of source entries must flow through the whole chain
exactly once: no re-delivery of wave-1 results anywhere, near-dups of
already-admitted docs dropped by the persisted index, contaminated
docs split out, survivors landing once across the shard streams with
deterministic entry ids. Runs against $VALKEY_URL when set, else the
embedded MiniValkeyServer — real executor sockets either way."""

from __future__ import annotations

import pytest

import uuid

from pyspark.sql.types import LongType, StringType, StructField, StructType

from python_stream_processing_framework_spark.sources.valkey import flatten_entry
from python_stream_processing_framework_spark.streaming import Stream

# Heavyweight battery: slow tier (see pyproject addopts; VERDICT r15 #1)
pytestmark = pytest.mark.slow

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

_D1 = "alpha beta gamma delta epsilon zeta eta theta"
_D3 = "one two three four five six seven eight"
_D4 = "red orange yellow green blue indigo violet pink"
_D6 = "mercury venus earth mars jupiter saturn uranus neptune"


def _delivered(client, skey: str, n_shards: int) -> dict[int, str]:
    out: dict[int, str] = {}
    for s in range(n_shards):
        for eid, f in client.xrange(f"{skey}:{s}"):
            assert int(eid.split("-")[0]) >= 9_000_000_000_000_000
            doc_id = int(f["doc_id"])
            assert doc_id not in out, f"doc {doc_id} delivered twice"
            out[doc_id] = f["text"]
    return out


def test_ingest_dedupe_decontaminate_deliver_chain(
    spark, tmp_path, valkey_client, valkey_url
):
    src_key = f"docs-{uuid.uuid4().hex[:10]}"
    out_key = f"clean-{uuid.uuid4().hex[:10]}"
    n_shards = 2

    heldout = spark.createDataFrame(
        [(100, "zzz three four five qqq")], DOC_SCHEMA
    )

    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.ingest_valkey(valkey_url, src_key, topic="docs")
    stream.dedupe_near("docs", DOC_SCHEMA, id_field="doc_id", text_field="text")
    stream.decontaminate("docs-unique", DOC_SCHEMA, heldout, n=3)
    stream.deliver_valkey(
        "docs-unique-clean",
        DOC_SCHEMA,
        valkey_url,
        out_key,
        exactly_once=True,
        num_shards=n_shards,
        shard_by="doc_id",
    )

    # wave 1: d2 is an exact near-dup of d1 (within-batch), d3 carries
    # the held-out 3-gram "three four five", d4 is clean and unique
    for doc in (
        {"doc_id": 1, "text": _D1},
        {"doc_id": 2, "text": _D1},
        {"doc_id": 3, "text": _D3},
        {"doc_id": 4, "text": _D4},
    ):
        valkey_client.xadd(src_key, flatten_entry(doc))
    stream.run_until_idle(rounds=5)  # 4 chained stages + slack

    assert _delivered(valkey_client, out_key, n_shards) == {1: _D1, 4: _D4}
    flagged = {
        r["doc_id"]
        for r in stream.read_topic("docs-unique-contaminated", DOC_SCHEMA).collect()
    }
    assert flagged == {3}

    # wave 2: d5 near-dups the ADMITTED d4 (cross-batch, persisted
    # index), d6 is new and clean — only d6 may flow out, and wave-1
    # deliveries must not repeat on any shard
    for doc in (
        {"doc_id": 5, "text": _D4},
        {"doc_id": 6, "text": _D6},
    ):
        valkey_client.xadd(src_key, flatten_entry(doc))
    stream.run_until_idle(rounds=5)

    assert _delivered(valkey_client, out_key, n_shards) == {
        1: _D1,
        4: _D4,
        6: _D6,
    }
    assert {
        r["doc_id"]
        for r in stream.read_topic("docs-unique", DOC_SCHEMA).collect()
    } == {1, 3, 4, 6}

    valkey_client.delete(src_key)
    for s in range(n_shards):
        valkey_client.delete(f"{out_key}:{s}")
