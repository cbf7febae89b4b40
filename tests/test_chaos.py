"""Chaos acceptance: the executable analog of the reference's chaos
gate (/root/reference/examples/chaos_demo.py:94-137 — spawn/kill
workers at random while producing, then assert lag == 0 and nothing
lost or duplicated).

Spark mapping: a "worker kill" is a streaming query dying mid-batch
(an exception thrown from the foreachBatch body — the batch never
commits to the checkpoint), and "XAUTOCLAIM recovery" is the next
worker starting on the SAME checkpoint and replaying the uncommitted
batch. Production continues between kills. Idempotent event-id tokens
upgrade the replays to exactly-once side effects — the same
at-least-once + dedup contract the reference's chaos demo relies on.
"""

from __future__ import annotations

import random

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming.dlq import IdempotentSink
from python_stream_processing_framework_spark.streaming.stream import Stream

EV_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("tx_id", StringType()),
        StructField("val", LongType()),
    ]
)

N_CYCLES = 6  # kill/restart cycles
WAVE = 10  # messages produced per cycle (production continues under chaos)


class SumSink(IdempotentSink):
    """Append-only durable effect log: a double-apply would be visible
    as a duplicated line, never averaged away."""

    def __init__(self, name, token_dir, effects_file):
        super().__init__(name, token_dir)
        self.effects = effects_file

    def on_write(self, event, token):
        with open(self.effects, "a") as f:
            f.write(f"{event['tx_id']} {int(event['val'])}\n")


def test_chaos_kill_restart_zero_lag_exact_sums(spark, tmp_path):
    rng = random.Random(42)
    broker = tmp_path / "broker"
    effects = tmp_path / "effects.log"
    effects.touch()
    tokens = str(tmp_path / "tokens")

    producer = Stream(spark, str(broker))
    # the subscribe facade will use this checkpoint for group 'chaos'
    ckpt = str(broker / "_checkpoints" / "chaos-chaos")

    emitted = 0
    for cycle in range(N_CYCLES):
        # production continues while workers die (reference produces
        # throughout its kill loop)
        producer.emit(
            "chaos",
            *[
                {"tx_id": f"tx_{emitted + i:03d}", "val": emitted + i}
                for i in range(WAVE)
            ],
        )
        emitted += WAVE

        # one chaos worker: applies effects in tx order and DIES after
        # a random number of them — the batch never commits
        sink = SumSink("chaos", tokens, str(effects))
        crash_after = rng.randint(0, WAVE + 3)
        applied_this_attempt = [0]

        def killed(batch, _bid, _sink=sink, _n=applied_this_attempt, _k=crash_after):
            rows = sorted(
                (r.asDict() for r in batch.collect()), key=lambda r: r["tx_id"]
            )
            for ev in rows:
                if _n[0] >= _k:
                    raise RuntimeError("chaos kill")
                _sink.write(ev)
                _n[0] += 1

        q = (
            producer.stream_topic("chaos", EV_SCHEMA)
            .writeStream.foreachBatch(killed)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # crash_after may exceed the pending backlog — that cycle's
        # worker survives (the reference's kill loop is also
        # probabilistic); a dead worker raises here and the batch it
        # died in is NOT committed.
        try:
            q.awaitTermination()
        except Exception as exc:  # noqa: BLE001 — the chaos kill
            assert "chaos kill" in str(exc) or "Streaming" in str(exc)

    # ---- final recovery worker: clean run over the same group
    final_sink = SumSink("chaos", tokens, str(effects))
    st = Stream(spark, str(broker))

    @st.subscribe("chaos", EV_SCHEMA, group="chaos")
    def handle(ev):
        final_sink.write(ev)

    st.run_until_idle()

    # exactly-once side effects across every kill/replay
    lines = effects.read_text().splitlines()
    seen = [ln.split()[0] for ln in lines]
    assert len(lines) == emitted, f"{len(lines)} effects for {emitted} msgs"
    assert len(set(seen)) == emitted  # no tx lost, none duplicated
    assert sum(int(ln.split()[1]) for ln in lines) == sum(range(emitted))

    # lag == 0: a fresh worker on the same group finds NOTHING pending
    probe_applied: list[str] = []
    st2 = Stream(spark, str(broker))

    @st2.subscribe("chaos", EV_SCHEMA, group="chaos")
    def probe(ev):
        probe_applied.append(ev["tx_id"])

    st2.run_until_idle()
    assert probe_applied == []
    assert len(effects.read_text().splitlines()) == emitted


def test_spill_survives_crash_between_spill_and_driver_emit(spark, tmp_path):
    """Crash-point chaos for the poison-batch spill path: attempt 1
    writes the executor-side spill files, then the driver dies BEFORE
    its own capped emission (the batch never commits). The replay
    (same job token, as foreachBatch would) re-runs handlers and
    overwrites the same spill files via rename — afterwards the DLQ
    holds every failed message exactly once: spilled rows from the
    idempotent files plus driver rows emitted exactly once."""
    import json

    from python_stream_processing_framework_spark.streaming.dlq import (
        handle_batch_with_retries,
    )

    retry_dir, dlq_dir = tmp_path / "r", tmp_path / "d"
    n, cap = 24, 4
    batch = spark.createDataFrame(
        [(f"e{i}", 1) for i in range(n)], "event_id string, _attempt long"
    )
    emitted: list[str] = []
    attempts = {"n": 0}

    def flaky_emit(topic, *events):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("driver crash before emit")
        emitted.extend(e["event_id"] for e in events)
        return [e["event_id"] for e in events]

    def handler(ev):
        raise ValueError("poison")

    kwargs = dict(
        handler=handler, topic="t", max_retries=1, emit=flaky_emit,
        distribute=True, distribute_partitions=4,
        collect_failure_cap=cap,
        spill_dirs=(str(retry_dir), str(dlq_dir)), job_token="g-b3",
    )
    try:
        handle_batch_with_retries(batch, **kwargs)
        raise AssertionError("first attempt must crash")
    except RuntimeError:
        pass
    # spills from the crashed attempt are already on disk
    pre = sorted(p.name for p in dlq_dir.glob("spill-*.json"))
    assert pre
    handle_batch_with_retries(batch, **kwargs)  # the replay

    files = sorted(dlq_dir.glob("spill-*.json"))
    assert sorted(p.name for p in files) == pre  # overwritten, not added
    spilled = [
        json.loads(line)["event_id"]
        for f in files
        for line in f.read_text().splitlines()
    ]
    assert len(spilled) == len(set(spilled))
    # driver rows emitted exactly once (the crashed attempt emitted 0)
    assert len(emitted) == len(set(emitted)) <= cap
    assert sorted(spilled + emitted) == sorted(f"e{i}" for i in range(n))
