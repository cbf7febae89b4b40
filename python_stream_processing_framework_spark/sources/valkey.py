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
