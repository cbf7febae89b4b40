"""Operational CLI — parity with the reference's `pspf` commands
(pspf/cli.py): topic/DLQ inspection, replay, purge, worker status,
consumer-group listing and offset reset.

`--broker` takes either a file-broker DIRECTORY (the facade's
substrate) or a LIVE Valkey/Redis URL (`redis://host:port`) — the
reference CLI's deployment shape; live commands use the same client
fallback as the connector (redis-py when installed, the in-repo RESP
client otherwise), so they work against a real daemon or the
embedded MiniValkeyServer.

Usage:
  python -m python_stream_processing_framework_spark.cli inspect     --broker DIR --topic T [--limit N] [--tail]
  python -m python_stream_processing_framework_spark.cli dlq-inspect --broker DIR --topic T
  python -m python_stream_processing_framework_spark.cli dlq-replay  --broker DIR --topic T
  python -m python_stream_processing_framework_spark.cli dlq-purge   --broker DIR --topic T
  python -m python_stream_processing_framework_spark.cli status         [--url URL]
  python -m python_stream_processing_framework_spark.cli cluster-status [--url URL]
  python -m python_stream_processing_framework_spark.cli groups      --broker DIR [--topic T]
  python -m python_stream_processing_framework_spark.cli reset       --broker DIR --topic T --group G
  python -m python_stream_processing_framework_spark.cli shards      --broker URL --topic T --n-shards N
  python -m python_stream_processing_framework_spark.cli backends
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _is_live(broker: str) -> bool:
    """A --broker that is a URL addresses a LIVE Valkey/Redis server
    (reference deployment shape, pspf/cli.py works against its real
    broker); a path addresses the file broker."""
    return broker.startswith(("redis://", "rediss://", "valkey://"))


def _live_client(broker: str):
    from python_stream_processing_framework_spark.sources.resp import (
        client_from_url,
    )

    return client_from_url(broker)


def _live_rows(client, stream_key: str) -> list[tuple[str, dict]]:
    from python_stream_processing_framework_spark.sources.valkey import (
        unflatten_entry,
    )

    return [
        (eid, unflatten_entry(fields)) for eid, fields in client.xrange(stream_key)
    ]


def _dlq_dir(broker: str, topic: str) -> Path:
    return Path(broker) / f"{topic}-dlq"


def _read_jsonl_dir(d: Path) -> tuple[list[dict], list[Path]]:
    """Snapshot the file list FIRST and return it with the rows, so
    callers that delete after processing remove exactly what they read
    — a message dead-lettered mid-replay must survive."""
    rows: list[dict] = []
    files = sorted(d.glob("*.json")) if d.exists() else []
    for f in files:
        for line in f.read_text().splitlines():
            if line.strip():
                rows.append(json.loads(line))
    return rows, files


def dlq_inspect(broker: str, topic: str, limit: int) -> None:
    if _is_live(broker):
        rows = [r for _eid, r in _live_rows(_live_client(broker), f"{topic}-dlq")]
    else:
        rows, _ = _read_jsonl_dir(_dlq_dir(broker, topic))
    print(f"{len(rows)} message(s) in {topic}-dlq")
    for r in rows[:limit]:
        print(json.dumps(r))


def dlq_replay(broker: str, topic: str) -> None:
    """Strip the DLQ-attached metadata and re-emit to the source topic
    (pspf/utils/replay.py:12-51). Only the keys the DLQ path itself
    added are removed — user fields that happen to start with `_` (or
    hold null) round-trip untouched."""
    from python_stream_processing_framework_spark.streaming.dlq import (
        DLQ_METADATA_KEYS,
    )

    if _is_live(broker):
        # snapshot-first live replay: XRANGE the DLQ, strip the
        # DLQ-attached keys, XADD clean copies back to the source
        # stream, then XDEL exactly the snapshot — a message
        # dead-lettered mid-replay survives, same contract as files
        from python_stream_processing_framework_spark.sources.valkey import (
            flatten_entry,
        )

        client = _live_client(broker)
        snapshot = _live_rows(client, f"{topic}-dlq")
        for _eid, r in snapshot:
            clean_row = {k: v for k, v in r.items() if k not in DLQ_METADATA_KEYS}
            client.xadd(topic, flatten_entry(clean_row))
        if snapshot:
            client.xdel(f"{topic}-dlq", *[eid for eid, _r in snapshot])
        print(f"replayed {len(snapshot)} message(s) to {topic}")
        return

    dlq = _dlq_dir(broker, topic)
    rows, files = _read_jsonl_dir(dlq)
    clean = [
        {k: v for k, v in r.items() if k not in DLQ_METADATA_KEYS}
        for r in rows
    ]
    if clean:
        import uuid

        out = Path(broker) / topic
        out.mkdir(parents=True, exist_ok=True)
        tmp = out / f".replay-{uuid.uuid4().hex}.tmp"
        tmp.write_text("\n".join(json.dumps(r) for r in clean) + "\n")
        tmp.rename(out / f"{tmp.stem.lstrip('.')}.json")
        for f in files:  # only what we read — not later arrivals
            f.unlink()
    print(f"replayed {len(clean)} message(s) to {topic}")


def dlq_purge(broker: str, topic: str) -> None:
    if _is_live(broker):
        client = _live_client(broker)
        n = client.xlen(f"{topic}-dlq")
        client.delete(f"{topic}-dlq")
        print(f"purged {n} message(s) from {topic}-dlq")
        return
    dlq = _dlq_dir(broker, topic)
    n = 0
    for f in dlq.glob("*.json"):
        f.unlink()
        n += 1
    print(f"purged {n} file(s) from {topic}-dlq")


def inspect_topic(broker: str, topic: str, limit: int, tail: bool) -> None:
    """Inspect a topic's records directly (reference `pspf inspect`,
    pspf/cli.py:18-55: LocalLog offsets + records). The high watermark
    is the record count; --tail shows the last N instead of first N."""
    if _is_live(broker):
        rows = [
            {"entry_id": eid, **r}
            for eid, r in _live_rows(_live_client(broker), topic)
        ]
    else:
        rows, _ = _read_jsonl_dir(Path(broker) / topic)
    print(f"Topic {topic}: High Watermark = {len(rows)}")
    window = rows[-limit:] if tail else rows[:limit]
    start = len(rows) - len(window) if tail else 0
    for off, r in enumerate(window, start=start):
        ts = r.get("timestamp", "")
        print(f"[{off}] {ts} | {r.get('key', '')} | {json.dumps(r)}")


def _http_json(url: str) -> tuple[int, dict]:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=5) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry a body
        return e.code, json.loads(e.read())


def status(url: str) -> None:
    """Worker health check (reference `pspf status`, pspf/cli.py:57-71)."""
    try:
        code, data = _http_json(f"{url}/health")
    except Exception as e:  # noqa: BLE001 - connection-level failure
        print(f"failed to connect to {url}: {e}")
        return
    print(f"worker {'online' if code == 200 else f'unhealthy ({code})'}: "
          f"{json.dumps(data)}")


def cluster_status(url: str) -> None:
    """Cluster topology (reference `pspf cluster-status`,
    pspf/cli.py:73-96)."""
    try:
        code, data = _http_json(f"{url}/cluster/status")
    except Exception as e:  # noqa: BLE001
        print(f"failed to connect to {url}: {e}")
        return
    if code != 200:
        print(f"worker returned {code}: {json.dumps(data)}")
        return
    if not data.get("ha_enabled"):
        print("HA/clustering not enabled on this worker")
    print(f"node: {data.get('node_id')}")
    print(f"held partitions: {data.get('held_partitions', [])}")


def groups(broker: str, topic: str | None) -> None:
    """List consumer groups and their progress (reference `pspf
    groups`, pspf/cli.py:98-116: XINFO GROUPS pending/lag). Spark's
    group state is the checkpoint: one `{topic}-{group}` dir under the
    broker's checkpoint root; committed batch count stands in for the
    acked offset."""
    if _is_live(broker):
        if not topic:
            raise SystemExit("groups: --topic is required with a live broker")
        client = _live_client(broker)
        gs = client.xinfo_groups(topic)
        for g in gs:
            print(
                f"group: {g['name']} | consumers: {g['consumers']} | "
                f"pending: {g['pending']} | last-delivered: "
                f"{g['last-delivered-id']} | lag: {g.get('lag')}"
            )
        if not gs:
            print(f"no consumer groups on stream {topic}")
        return
    root = Path(broker) / "_checkpoints"
    found = False
    for ck in sorted(root.iterdir() if root.exists() else []):
        if not ck.is_dir():
            continue
        if topic and not ck.name.startswith(f"{topic}-"):
            continue
        commits = [
            p for p in (ck / "commits").glob("*") if p.name.isdigit()
        ] if (ck / "commits").exists() else []
        latest = max((int(p.name) for p in commits), default=-1)
        print(
            f"checkpoint: {ck.name} | committed batches: {len(commits)}"
            f" | latest batch id: {latest}"
        )
        found = True
    if not found:
        print(f"no consumer groups found under {root}")


def shards(broker: str, topic: str, n_shards: int) -> None:
    """Per-shard + rollup view of a SHARDED egress target
    (`valkey_stream_sink_idempotent_sharded` writes `{topic}:0..N-1`):
    entry counts, last ids, and per-group pending/lag summed across
    every shard key — the one-screen answer to 'is the sharded sink
    caught up'. Live brokers only (a sharded target IS a set of live
    stream keys)."""
    if not _is_live(broker):
        raise SystemExit("shards: requires a live broker url (redis://...)")
    client = _live_client(broker)
    total_len = 0
    group_pending: dict[str, int] = {}
    group_lag: dict[str, int] = {}
    for s in range(n_shards):
        key = f"{topic}:{s}"
        try:
            n = client.xlen(key)
        except Exception:  # noqa: BLE001 - missing shard key
            n = 0
        total_len += n
        last = "-"
        gs = []
        if n:
            info = client.xinfo_stream(key)
            last = info.get("last-generated-id", "-")
            gs = client.xinfo_groups(key)
        for g in gs:
            group_pending[g["name"]] = group_pending.get(g["name"], 0) + int(
                g["pending"] or 0
            )
            lag = g.get("lag")
            if lag is not None:
                group_lag[g["name"]] = group_lag.get(g["name"], 0) + int(lag)
        print(f"shard {key}: entries: {n} | last-id: {last}")
    print(f"total: {total_len} entries across {n_shards} shards")
    for name in sorted(group_pending):
        lag = group_lag.get(name, "-")
        print(
            f"group {name}: pending: {group_pending[name]} | lag: {lag}"
            " (summed across shards)"
        )


def reset(broker: str, topic: str, group: str) -> None:
    """Reset a consumer group to the beginning (reference `pspf reset`
    offset 0, pspf/cli.py:119-135). Spark's committed offsets ARE the
    checkpoint, so reset == remove the `{topic}-{group}` checkpoint
    dir; the next run reprocesses the topic from offset 0. (Mid-stream
    ids aren't supported — checkpoints don't rewind partially.)"""
    if _is_live(broker):
        # live groups rewind in place: XGROUP SETID 0 re-delivers the
        # whole stream to the group (the reference's offset-0 reset)
        _live_client(broker).xgroup_setid(topic, group, "0")
        print(f"reset group {group!r} on topic {topic!r} to offset 0")
        return
    import shutil

    ck = Path(broker) / "_checkpoints" / f"{topic}-{group}"
    if not ck.exists():
        print(f"no checkpoint for group {group!r} on topic {topic!r}")
        return
    shutil.rmtree(ck)
    print(f"reset group {group!r} on topic {topic!r} to offset 0")


def search(data: str, query: str, k: int) -> None:
    """BM25 keyword search over a documents parquet (operators/
    retrieval.bm25_topk) — corpus curation from the shell: what does
    the corpus contain about X, which docs would a probe query
    retrieve."""
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.retrieval import (
        bm25_topk,
    )
    from python_stream_processing_framework_spark.session import get_spark

    spark = get_spark("pspf-spark-search")
    path = data if data.endswith(".parquet") else f"{data}/documents.parquet"
    docs = spark.read.parquet(path)
    top = bm25_topk(docs, query, k=k)
    hits = (
        top.join(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", "bm25", F.substring("text", 1, 80).alias("snippet"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .collect()
    )
    for r in hits:
        print(f"{r['doc_id']:>8}  {r['bm25']:.4f}  {r['snippet']}")
    if not hits:
        print("no documents matched the query")


def trim(broker: str, topic: str, keep_files: int) -> None:
    """Retention: delete the topic's oldest emit-files beyond the
    newest `keep_files` — the file-broker analog of the reference's
    XADD maxlen stream trimming (pspf/connectors/valkey.py:292).

    Deleting OLD files is safe for consumers: a running query's file
    source ignores already-committed files that disappear, and a new
    consumer simply sees less history (exactly XTRIM semantics). The
    unsafe operation — rewriting/compacting files in place — is
    deliberately not offered: the file source tracks files by name,
    so a compacted file would re-deliver its rows as new data.
    """
    if keep_files < 0:
        raise SystemExit("trim: --keep must be >= 0 (0 = drop all history)")
    if _is_live(broker):
        # live streams trim by MESSAGE count: XTRIM MAXLEN keep (the
        # reference's maxlen contract, pspf/connectors/valkey.py:292)
        client = _live_client(broker)
        dropped = client.xtrim(topic, keep_files, approximate=False)
        print(
            f"trimmed {dropped} messages from {topic}; "
            f"{client.xlen(topic)} kept"
        )
        return
    d = Path(broker) / topic
    # *.json is THE topic contract (emit, the file source, replay all
    # use it); a looser glob would delete and miscount files consumers
    # never saw.
    # Tie-break equal mtimes (coarse-mtime filesystems, same-tick writes)
    # by name so oldest-first is deterministic and a newer file is never
    # deleted while an older sibling is kept.
    files = sorted(
        (p for p in d.glob("*.json") if p.is_file()),
        key=lambda p: (p.stat().st_mtime, p.name),
    )
    doomed = files[:-keep_files] if keep_files > 0 else files
    n_rows = 0
    for f in doomed:
        n_rows += len(f.read_text().splitlines())
        f.unlink()
    print(
        f"trimmed {len(doomed)} files ({n_rows} messages) from {topic}; "
        f"{len(files) - len(doomed)} files kept"
    )


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="pspf-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("dlq-inspect", "dlq-replay", "dlq-purge"):
        p = sub.add_parser(cmd)
        p.add_argument("--broker", required=True)
        p.add_argument("--topic", required=True)
        if cmd == "dlq-inspect":
            p.add_argument("--limit", type=int, default=20)
    p = sub.add_parser("inspect")
    p.add_argument("--broker", required=True)
    p.add_argument("--topic", required=True)
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--tail", action="store_true")
    for cmd in ("status", "cluster-status"):
        p = sub.add_parser(cmd)
        p.add_argument("--url", default="http://localhost:8001")
    p = sub.add_parser("groups")
    p.add_argument("--broker", required=True)
    p.add_argument("--topic", default=None)
    p = sub.add_parser("shards")
    p.add_argument("--broker", required=True)
    p.add_argument("--topic", required=True)
    p.add_argument("--n-shards", type=int, required=True)
    p = sub.add_parser("reset")
    p.add_argument("--broker", required=True)
    p.add_argument("--topic", required=True)
    p.add_argument("--group", required=True)
    p = sub.add_parser("trim")
    p.add_argument("--broker", required=True)
    p.add_argument("--topic", required=True)
    p.add_argument(
        "--keep", type=int, required=True,
        help="newest emit-files to keep (XTRIM/maxlen analog)",
    )
    sub.add_parser("backends")
    p = sub.add_parser("search")
    p.add_argument("--data", required=True, help="sf dir or documents parquet")
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)

    if args.cmd == "dlq-inspect":
        dlq_inspect(args.broker, args.topic, args.limit)
    elif args.cmd == "dlq-replay":
        dlq_replay(args.broker, args.topic)
    elif args.cmd == "dlq-purge":
        dlq_purge(args.broker, args.topic)
    elif args.cmd == "inspect":
        inspect_topic(args.broker, args.topic, args.limit, args.tail)
    elif args.cmd == "status":
        status(args.url)
    elif args.cmd == "cluster-status":
        cluster_status(args.url)
    elif args.cmd == "groups":
        groups(args.broker, args.topic)
    elif args.cmd == "shards":
        shards(args.broker, args.topic, args.n_shards)
    elif args.cmd == "reset":
        reset(args.broker, args.topic, args.group)
    elif args.cmd == "trim":
        trim(args.broker, args.topic, args.keep)
    elif args.cmd == "search":
        search(args.data, args.query, args.k)
    elif args.cmd == "backends":
        from python_stream_processing_framework_spark.sources import registry

        for name in registry.names():
            b = registry.get(name)
            print(f"{name}: {b.doc}")


if __name__ == "__main__":
    main()
