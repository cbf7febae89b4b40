"""Valkey/Redis Streams backend — the reference's DEFAULT broker
(pspf/connectors/valkey.py) re-expressed broker-free.

No Valkey server exists in this environment, so the parts a Spark
cluster actually needs are shipped as pure, testable logic (the same
treatment the Kafka backend got in streams.py):

- the WIRE FORMAT: per-field flatten on XADD (dict/list/bool/None
  values JSON-serialized; str/int/float pass through —
  pspf/connectors/valkey.py:281-293) and the symmetric per-field
  `json.loads`-try on read (valkey.py:179-193). Note the reference's
  own quirk is preserved: a plain string that parses as JSON (e.g.
  "5") comes back as its parsed value.
- XADD ENTRY-ID semantics: `<ms>-<seq>`, strictly monotonic — same
  millisecond increments seq, a later millisecond resets it
  (the contract consumers order and checkpoint by).
- naming: `{stream}-dlq` sibling (valkey.py:100) and the retry
  tracker hash `pspf:retries:{group}:{stream}` (valkey.py:101).
- DLQ enrichment: `_error/_original_stream/_original_msg_id/
  _moved_timestamp` with `_moved_timestamp` a STRING, as the
  reference stores it (valkey.py:231-236).

For Spark, a stream's XRANGE dump (JSON-lines of {"id", "fields"})
is the exchange format: `append_to_dump` is the broker-free XADD and
`ValkeyDumpDataSource` — a Spark 4 Python data source — reads dumps
as a DataFrame, one input partition per dump file so a sharded dump
scans in parallel. A live deployment swaps the file IO for real
XADD/XRANGE calls; every byte-level decision stays identical.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------- wire format


def flatten_entry(data: dict[str, Any]) -> dict[str, Any]:
    """XADD-safe field map (pspf/connectors/valkey.py:281-293): stream
    fields must be primitives, so dict/list/bool/None values are
    JSON-serialized; str/int/float pass through unchanged."""
    safe: dict[str, Any] = {}
    for k, v in data.items():
        if isinstance(v, (dict, list, bool)) or v is None:
            safe[k] = json.dumps(v)
        else:
            safe[k] = v
    return safe


def unflatten_entry(fields: dict[str, Any]) -> dict[str, Any]:
    """Inverse of `flatten_entry` (pspf/connectors/valkey.py:179-193):
    every string field is tentatively `json.loads`-ed; parse failures
    keep the raw string. (Reference quirk preserved: "5" -> 5.)"""
    parsed: dict[str, Any] = {}
    for k, v in fields.items():
        if isinstance(v, str):
            try:
                parsed[k] = json.loads(v)
            except (json.JSONDecodeError, TypeError):
                parsed[k] = v
        else:
            parsed[k] = v
    return parsed


# --------------------------------------------------------------- entry ids


def parse_entry_id(entry_id: str) -> tuple[int, int]:
    """`<ms>-<seq>` -> (ms, seq). Raises ValueError on malformed ids."""
    ms_s, _, seq_s = entry_id.partition("-")
    return int(ms_s), int(seq_s)


def next_entry_id(last_id: str | None, now_ms: int) -> str:
    """XADD auto-id: strictly greater than `last_id`. A later
    millisecond starts at seq 0; the same (or an earlier — clock
    skew) millisecond increments seq under the last id's ms."""
    if last_id is None:
        return f"{now_ms}-0"
    last_ms, last_seq = parse_entry_id(last_id)
    if now_ms > last_ms:
        return f"{now_ms}-0"
    return f"{last_ms}-{last_seq + 1}"


def entry_id_key(entry_id: str) -> tuple[int, int]:
    """Sort key: numeric (ms, seq) — string order is WRONG for ids
    ("999-0" > "1000-0" lexically)."""
    return parse_entry_id(entry_id)


# --------------------------------------------------------------- naming


def dlq_stream(stream_key: str) -> str:
    """Sibling DLQ stream (pspf/connectors/valkey.py:100)."""
    return f"{stream_key}-dlq"


def retry_tracker_key(group: str, stream_key: str) -> str:
    """Retry-count hash name (pspf/connectors/valkey.py:101)."""
    return f"pspf:retries:{group}:{stream_key}"


def dlq_entry(
    data: dict[str, Any], *, msg_id: str, stream_key: str, error: str, now: float
) -> dict[str, Any]:
    """DLQ enrichment (pspf/connectors/valkey.py:228-236). The
    reference stringifies `_moved_timestamp`; preserved verbatim so a
    real consumer sees identical fields."""
    out = dict(data)
    out["_error"] = str(error)
    out["_original_stream"] = stream_key
    out["_original_msg_id"] = msg_id
    out["_moved_timestamp"] = str(now)
    return out


# --------------------------------------------------------------- dump IO


def append_to_dump(path: str | Path, events: list[dict], *, now_ms: int) -> list[str]:
    """Broker-free XADD: append entries to an XRANGE-dump file
    (JSON-lines of {"id": "<ms>-<seq>", "fields": {...}}), assigning
    monotonic entry ids continuing from the file's last id."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    last_id: str | None = None
    if p.exists():
        lines = [ln for ln in p.read_text().splitlines() if ln.strip()]
        if lines:
            last_id = json.loads(lines[-1])["id"]
    ids: list[str] = []
    with p.open("a") as f:
        for ev in events:
            eid = next_entry_id(last_id, now_ms)
            f.write(json.dumps({"id": eid, "fields": flatten_entry(ev)}) + "\n")
            ids.append(eid)
            last_id = eid
    return ids


def read_dump(path: str | Path) -> list[tuple[str, dict[str, Any]]]:
    """Driver-side XRANGE over a dump file: [(msg_id, payload)] with
    the payload unflattened — mirrors `read_batch`'s return shape."""
    out = []
    for line in Path(path).read_text().splitlines():
        if line.strip():
            rec = json.loads(line)
            out.append((rec["id"], unflatten_entry(rec["fields"])))
    return out


# --------------------------------------------------------------- DataSource

try:  # Spark 4 Python data source API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class ValkeyDumpDataSource(DataSource):
        """`spark.read.format("valkey_dump").option("path", ...)`:
        reads XRANGE-dump files (a file or a directory of `*.jsonl`
        shards) as (msg_id, data) rows, `data` holding the unflattened
        payload re-serialized as canonical JSON (apply `from_json`
        with the event schema to type it). One input partition per
        shard: a dump sharded by id-range scans fully parallel."""

        @classmethod
        def name(cls) -> str:
            return "valkey_dump"

        def schema(self) -> str:
            return "msg_id string, data string"

        def reader(self, schema) -> "ValkeyDumpReader":
            return ValkeyDumpReader(self.options)

    class ValkeyDumpReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("valkey_dump requires .option('path', ...)")

        def partitions(self):
            p = Path(self.path)
            shards = sorted(p.glob("*.jsonl")) if p.is_dir() else [p]
            return [InputPartition(str(s)) for s in shards]

        def read(self, partition):
            # executor-side: parse one shard
            for line in Path(partition.value).read_text().splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield (
                    rec["id"],
                    json.dumps(
                        unflatten_entry(rec["fields"]), sort_keys=True, default=str
                    ),
                )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAVE_DATASOURCE_API = False


def valkey_dump_source(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read an XRANGE dump via the Python data source."""
    if not HAVE_DATASOURCE_API:  # pragma: no cover
        raise RuntimeError("valkey_dump needs the Spark 4 Python data source API")
    try:
        spark.dataSource.register(ValkeyDumpDataSource)
    except Exception:  # already registered
        pass
    return spark.read.format("valkey_dump").option("path", path).load()


def valkey_dump_sink(df: DataFrame, path: str, *, now_ms: int) -> list[str]:
    """Broker-free XADD sink for a (small) batch DataFrame: appends
    every row as a stream entry. Driver-side by design — a real
    deployment replaces this with pipelined XADDs per partition via
    foreachPartition; the wire format (`flatten_entry`) is the part
    that carries over unchanged."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return append_to_dump(path, rows, now_ms=now_ms)


# --------------------------------------------------------------- live tier
#
# Everything below talks to a real Valkey/Redis server via the
# `redis` package (import-gated, like the live-broker tests). The
# pure pieces — pipelined-XADD batching, exclusive-XRANGE paging —
# take the CLIENT AS AN ARGUMENT, so they unit-test against a fake
# in this broker-free sandbox and run unchanged against a server.


def _redis_client(url: str):
    """Stream client for ``url``: redis-py when installed, else the
    in-repo RESP client (sources/resp.py) — a stdlib socket client
    speaking the command subset this tier uses, so the live tier
    runs even where `pip install redis` is impossible. Executors
    call this inside foreachPartition; the lazy import keeps resp
    off the serialization path."""
    from python_stream_processing_framework_spark.sources.resp import (
        client_from_url,
    )

    return client_from_url(url)


def xadd_rows(
    client,
    stream_key: str,
    rows,
    *,
    maxlen: int | None = None,
    pipeline_size: int = 500,
) -> int:
    """Pipelined XADDs for one partition's rows.

    The reference XADDs one awaited call per message
    (pspf/connectors/valkey.py:292, with `maxlen` trimming); at Spark
    partition sizes that round-trip per row dominates, so rows batch
    into non-transactional pipelines of `pipeline_size`. Wire format
    is `flatten_entry` — byte-identical to the reference's producer.
    """
    pipe = client.pipeline(transaction=False)
    n = 0
    for row in rows:
        kwargs = {"maxlen": maxlen} if maxlen is not None else {}
        pipe.xadd(stream_key, flatten_entry(dict(row)), **kwargs)
        n += 1
        if n % pipeline_size == 0:
            pipe.execute()
    if n % pipeline_size:
        pipe.execute()
    return n


def xrange_after(client, stream_key: str, last_id: str, *, count: int = 1000):
    """One exclusive-start XRANGE page: entries strictly AFTER
    `last_id` (the `(id` exclusive-range form), as (entry_id,
    value_json) rows in the dump-source schema. `last_id='0-0'`
    reads from the beginning — XADD never auto-assigns 0-0."""
    entries = client.xrange(stream_key, min=f"({last_id}", max="+", count=count)
    return [
        (eid, json.dumps(unflatten_entry(fields), sort_keys=True, default=str))
        for eid, fields in entries
    ]


#: entry-id millisecond base for deterministic (exactly-once) batch
#: delivery: far above any real clock ms (year ~287,000), so batch N's
#: ids order strictly after batch N-1's, and a deterministic stream
#: can never be interleaved by auto-id producers (the scheme forbids
#: other producers anyway — their real-clock ids would be rejected).
DETERMINISTIC_ID_BASE = 9_000_000_000_000_000

#: the server-side rejection that MEANS "already delivered" for the
#: idempotent producer (identical wording on real Redis/Valkey and
#: the embedded mini-broker)
_ALREADY_DELIVERED = "equal or smaller"


def xadd_rows_idempotent(
    client,
    stream_key: str,
    rows,
    *,
    batch_id: int,
    maxlen: int | None = None,
    pipeline_size: int = 500,
) -> tuple[int, int]:
    """Exactly-once pipelined XADD for a DETERMINISTICALLY-ORDERED
    row sequence: row i of batch B gets the explicit entry id
    ``(DETERMINISTIC_ID_BASE + B)-i``, so a retry re-adds the same
    ids and the server's XADD monotonicity rule rejects every
    already-delivered row — the idempotent-producer pattern with the
    dedupe ledger enforced BY the broker (works after MAXLEN trims
    too: the stream's last-generated-id survives trimming). Returns
    ``(delivered, skipped)``.

    Requirements: the row ORDER must be deterministic per batch_id
    (``valkey_stream_sink_idempotent`` guarantees it by sorting on a
    content digest), and the target stream must have NO other
    producers (an auto-id XADD's real-clock ms sits far below the
    deterministic base and would be rejected after the first
    idempotent write).
    """
    base = DETERMINISTIC_ID_BASE + batch_id
    pipe = client.pipeline(transaction=False)
    n = 0
    delivered = skipped = 0

    def flush() -> None:
        nonlocal delivered, skipped
        for r in pipe.execute(raise_on_error=False):
            if isinstance(r, Exception):
                if _ALREADY_DELIVERED in str(r):
                    skipped += 1
                else:
                    raise r
            else:
                delivered += 1

    for i, row in enumerate(rows):
        kwargs = {"maxlen": maxlen} if maxlen is not None else {}
        pipe.xadd(
            stream_key, flatten_entry(dict(row)), id=f"{base}-{i}", **kwargs
        )
        n += 1
        if n % pipeline_size == 0:
            flush()
    if n % pipeline_size:
        flush()
    return delivered, skipped


def valkey_stream_sink_idempotent(
    df: DataFrame,
    url: str,
    stream_key: str,
    *,
    batch_id: int,
    maxlen: int | None = None,
    pipeline_size: int = 500,
) -> None:
    """EXACTLY-ONCE delivery of one replayable batch to a Valkey
    stream (the idempotent sibling of ``valkey_stream_sink``).

    A Redis/Valkey stream is a single total order, so exactly-once
    demands one serialized writer per batch: the batch is keyed by a
    content digest (``md5(to_json(struct(*)))`` — type-agnostic,
    identical across retries even when an upstream shuffle reorders
    rows; identical duplicate rows may swap seq slots, which writes
    the same bytes either way), shuffled to ONE task, sorted, and
    XADDed with deterministic ids (``xadd_rows_idempotent``). The
    serialization point costs nothing at scale that the stream
    itself doesn't already impose — the broker applies entries one
    at a time regardless; pipelining keeps the single connection
    saturated. For parallel egress use
    ``valkey_stream_sink_idempotent_sharded``, which spreads the
    batch across N stream keys with the same per-shard exactly-once
    contract.
    """
    key_cols = list(df.columns)
    one = (
        df.withColumn("_ek", F.md5(F.to_json(F.struct(*key_cols))))
        .repartition(1)
        .sortWithinPartitions("_ek")
        .drop("_ek")
    )

    def write_partition(rows) -> None:
        client = _redis_client(url)
        try:
            xadd_rows_idempotent(
                client,
                stream_key,
                (r.asDict(recursive=True) for r in rows),
                batch_id=batch_id,
                maxlen=maxlen,
                pipeline_size=pipeline_size,
            )
        finally:
            client.close()

    one.foreachPartition(write_partition)


def valkey_stream_sink_idempotent_sharded(
    df: DataFrame,
    url: str,
    stream_key: str,
    *,
    batch_id: int,
    num_shards: int,
    shard_by: str | None = None,
    maxlen: int | None = None,
    pipeline_size: int = 500,
) -> None:
    """EXACTLY-ONCE delivery sharded across ``num_shards`` stream
    keys ``{stream_key}:0 .. {stream_key}:{num_shards-1}`` — the
    parallel-egress form of ``valkey_stream_sink_idempotent``, which
    serializes each batch through one writer because a single Redis
    stream is one total order. Sharding trades that GLOBAL order for
    ``num_shards``-way write parallelism while keeping every
    exactly-once property per shard: each shard is one deterministic
    sorted sequence XADDed with deterministic entry ids, so a task
    retry (or a whole foreachBatch redelivery) re-sends each shard's
    identical sequence and the broker rejects the already-delivered
    prefix. A crashed writer always leaves a PREFIX of its shard's
    sequence (entries land in sorted order through one connection),
    which is exactly the case the id-monotonicity rule heals.

    Shard assignment must be retry-deterministic, so it is a pure
    function of row CONTENT, never of partition placement:
    ``pmod(xxhash64(shard_col_or_content_digest), num_shards)``.
    With ``shard_by`` (a column name), all rows sharing that key land
    in the same shard — per-key total order survives, the Kafka
    partition-key semantic; consumers needing per-entity order read
    one shard. Without it, rows spread by content digest (max
    parallelism, order meaningful only within a shard).

    Scale shape: one shuffle on the shard id (num_shards reducers,
    each pipelining one connection), rows never visit the driver.
    Each shard stream must have NO other producers (deterministic
    ids sit above real-clock ids — see xadd_rows_idempotent).
    Consumers enumerate shards by key pattern; lag/trim tooling
    applies per shard key."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    key_cols = list(df.columns)
    shard_src = (
        F.col(shard_by).cast("string")
        if shard_by is not None
        else F.md5(F.to_json(F.struct(*key_cols)))
    )
    sharded = (
        df.withColumn("_ek", F.md5(F.to_json(F.struct(*key_cols))))
        .withColumn("_shard", F.pmod(F.xxhash64(shard_src), F.lit(num_shards)))
        .repartition(num_shards, F.col("_shard"))
        .sortWithinPartitions("_shard", "_ek")
    )

    def write_partition(rows) -> None:
        import itertools

        client = _redis_client(url)
        try:
            # hash partitioning may co-locate several shards in one
            # task; rows arrive sorted by (_shard, _ek), so each
            # group is that shard's full deterministic sequence
            for shard, group in itertools.groupby(
                rows, key=lambda r: r["_shard"]
            ):
                xadd_rows_idempotent(
                    client,
                    f"{stream_key}:{shard}",
                    (
                        {
                            k: v
                            for k, v in r.asDict(recursive=True).items()
                            if k not in ("_ek", "_shard")
                        }
                        for r in group
                    ),
                    batch_id=batch_id,
                    maxlen=maxlen,
                    pipeline_size=pipeline_size,
                )
        finally:
            client.close()

    sharded.foreachPartition(write_partition)


def valkey_stream_sink(
    df: DataFrame,
    url: str,
    stream_key: str,
    *,
    maxlen: int | None = None,
    pipeline_size: int = 500,
) -> None:
    """Distributed XADD sink: one connection + pipelined writes per
    partition (`foreachPartition`) — the production shape the
    driver-side `valkey_dump_sink` docstring promises. Rows never
    visit the driver. At-least-once on task retry, like any
    non-transactional external sink: pair with the idempotent-sink
    token pattern (streaming/dlq.py) or a `maxlen`-trimmed audit
    stream when duplicates matter. In streaming, call from
    foreachBatch."""

    def write_partition(rows) -> None:
        client = _redis_client(url)
        try:
            xadd_rows(
                client,
                stream_key,
                (r.asDict(recursive=True) for r in rows),
                maxlen=maxlen,
                pipeline_size=pipeline_size,
            )
        finally:
            client.close()

    df.foreachPartition(write_partition)


if HAVE_DATASOURCE_API:
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class ValkeyLiveDataSource(DataSource):
        """Spark 4 Python data source for a LIVE Valkey stream.

        `spark.readStream.format("valkey_live").option("url", ...)
        .option("stream_key", ...)` — micro-batches page the stream
        with exclusive XRANGE from the last checkpointed entry id,
        so offsets are the broker's own `<ms>-<seq>` ids (the same
        ordering contract consumers checkpoint by, entry_id_key).
        Schema matches the dump source: (entry_id, value) with value
        the JSON of the unflattened fields.

        Offset model: {"last_id": "<ms>-<seq>"}; `initialOffset` is
        "0-0" (read from the beginning — the facade's consumer-group
        semantics; start tail-only by passing .option("start_id",
        "$"-style explicit id). The simple-reader API reads pages on
        the driver and replays committed ranges on executors, which
        fits a single ordered stream (Valkey streams are not
        partitioned; shard across stream KEYS for parallel ingest —
        one source per shard, union the DataFrames).
        """

        @classmethod
        def name(cls) -> str:
            return "valkey_live"

        def schema(self) -> str:
            return "entry_id string, value string"

        def simpleStreamReader(self, schema) -> "ValkeyLiveStreamReader":
            return ValkeyLiveStreamReader(self.options)

    class ValkeyLiveStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options, client_factory=None):
            self.url = options.get("url")
            self.stream_key = options.get("stream_key")
            if not self.url or not self.stream_key:
                raise ValueError(
                    "valkey_live requires .option('url', ...) and "
                    ".option('stream_key', ...)"
                )
            self.start_id = options.get("start_id", "0-0")
            self.batch_size = int(options.get("batch_size", 1000))
            self._client_factory = client_factory or _redis_client
            self._client = None

        def _c(self):
            if self._client is None:
                self._client = self._client_factory(self.url)
            return self._client

        def initialOffset(self) -> dict:
            return {"last_id": self.start_id}

        def read(self, start: dict):
            rows = xrange_after(
                self._c(), self.stream_key, start["last_id"],
                count=self.batch_size,
            )
            end = {"last_id": rows[-1][0]} if rows else dict(start)
            return iter(rows), end

        def readBetweenOffsets(self, start: dict, end: dict):
            # committed-range replay (executor-side on recovery):
            # page the same exclusive range up to and including end.
            out = []
            last = start["last_id"]
            end_key = entry_id_key(end["last_id"])
            while entry_id_key(last) < end_key:
                page = xrange_after(
                    self._c(), self.stream_key, last, count=self.batch_size
                )
                if not page:
                    break
                for eid, val in page:
                    if entry_id_key(eid) > end_key:
                        return iter(out)
                    out.append((eid, val))
                last = page[-1][0]
            return iter(out)

        def commit(self, end: dict) -> None:
            pass


def valkey_live_stream(
    spark: SparkSession, url: str, stream_key: str, **options: str
) -> DataFrame:
    """readStream a live Valkey stream (see ValkeyLiveDataSource)."""
    if not HAVE_DATASOURCE_API:  # pragma: no cover
        raise RuntimeError("valkey_live needs the Spark 4 Python data source API")
    try:
        spark.dataSource.register(ValkeyLiveDataSource)
    except Exception:  # already registered
        pass
    reader = (
        spark.readStream.format("valkey_live")
        .option("url", url)
        .option("stream_key", stream_key)
    )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
