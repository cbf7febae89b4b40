"""Operational CLI — parity with the reference's `pspf` commands
(pspf/cli.py): DLQ inspection, replay, purge, plus bench/correctness
entry points for this engine.

Usage:
  python -m python_stream_processing_framework_spark.cli dlq-inspect --broker DIR --topic T
  python -m python_stream_processing_framework_spark.cli dlq-replay  --broker DIR --topic T
  python -m python_stream_processing_framework_spark.cli dlq-purge   --broker DIR --topic T
  python -m python_stream_processing_framework_spark.cli backends
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


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
    dlq = _dlq_dir(broker, topic)
    n = 0
    for f in dlq.glob("*.json"):
        f.unlink()
        n += 1
    print(f"purged {n} file(s) from {topic}-dlq")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="pspf-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("dlq-inspect", "dlq-replay", "dlq-purge"):
        p = sub.add_parser(cmd)
        p.add_argument("--broker", required=True)
        p.add_argument("--topic", required=True)
        if cmd == "dlq-inspect":
            p.add_argument("--limit", type=int, default=20)
    sub.add_parser("backends")
    args = ap.parse_args(argv)

    if args.cmd == "dlq-inspect":
        dlq_inspect(args.broker, args.topic, args.limit)
    elif args.cmd == "dlq-replay":
        dlq_replay(args.broker, args.topic)
    elif args.cmd == "dlq-purge":
        dlq_purge(args.broker, args.topic)
    elif args.cmd == "backends":
        from python_stream_processing_framework_spark.sources import registry

        for name in registry.names():
            b = registry.get(name)
            print(f"{name}: {b.doc}")


if __name__ == "__main__":
    main()
