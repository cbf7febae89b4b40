"""Embedded RESP mini-broker + minimal client (stdlib only).

The live Valkey tier (sources/valkey.py, the reference's default
broker — /root/reference/pspf/connectors/valkey.py:83-389) could
previously only be exercised end-to-end where a real server and the
`redis` package exist. This module closes that gap with two pieces:

- ``MiniValkeyServer``: a thread-per-connection RESP2 TCP server
  holding streams in memory and speaking exactly the command subset
  the reference connector exercises — XADD, XRANGE, XLEN, XDEL,
  XGROUP CREATE/DESTROY, XREADGROUP, XACK, XPENDING, XAUTOCLAIM,
  XINFO STREAM/GROUPS — plus PING/DEL/CLIENT/SELECT for client
  handshakes. Entry-id semantics delegate to the same
  ``next_entry_id`` the wire-format unit tests pin, so the embedded
  broker and the broker-free logic can never drift. It is a DEV/CI
  broker, not a Valkey replacement: no persistence, no replication,
  no RESP3, no keyspace beyond streams.
- ``MiniRespClient``: the redis-py method subset this repo's live
  tier uses, with redis-py-shaped returns (decoded strings, parsed
  xpending/xinfo dicts). It speaks real RESP2 over a socket, so it
  works against a genuine Valkey/Redis server too — which is why
  ``valkey._redis_client`` can fall back to it when the `redis`
  package is absent instead of refusing to run.

``client_from_url`` prefers the real redis-py client when installed
(full protocol, retries, TLS) and falls back to MiniRespClient; the
test fixtures prefer a real server at $VALKEY_URL and fall back to an
in-process MiniValkeyServer — the real-daemon path always wins when
available.
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time
from typing import Any

from python_stream_processing_framework_spark.sources.valkey import (
    entry_id_key,
    next_entry_id,
)


try:
    # when redis-py is installed, its ResponseError is the error both
    # clients surface: re-export it so callers catch ONE type whether
    # the server reply came through redis-py or MiniRespClient
    from redis.exceptions import ResponseError
except ImportError:

    class ResponseError(Exception):
        """Server -ERR reply (redis-py absent: local stand-in)."""


class RespError(ResponseError):
    """Server-side -ERR reply raised by MiniRespClient
    (string-matchable like redis-py's: BUSYGROUP, NOGROUP...).
    Catch ``resp.ResponseError`` to handle either client's errors."""


# --------------------------------------------------------------- protocol

_CRLF = b"\r\n"


def _encode_command(args: tuple) -> bytes:
    """Client request: RESP array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


def _encode_reply(obj: Any) -> bytes:
    """Server reply encoding. Python shapes map onto RESP2: int ->
    integer, str/bytes -> bulk string, None -> null bulk, list/tuple
    -> array, RespError -> error, ("+", s) -> simple string."""
    if isinstance(obj, RespError):
        return b"-ERR %s\r\n" % str(obj).encode()
    if isinstance(obj, tuple) and len(obj) == 2 and obj[0] == "+":
        return b"+%s\r\n" % obj[1].encode()
    if isinstance(obj, bool):  # before int: bool is int in Python
        return b":%d\r\n" % int(obj)
    if isinstance(obj, int):
        return b":%d\r\n" % obj
    if obj is None:
        return b"$-1\r\n"
    if isinstance(obj, (list, tuple)):
        return b"*%d\r\n" % len(obj) + b"".join(_encode_reply(o) for o in obj)
    b = obj if isinstance(obj, bytes) else str(obj).encode()
    return b"$%d\r\n%s\r\n" % (len(b), b)


def _read_reply(f) -> Any:
    """Parse one RESP2 reply from a file-like socket reader."""
    line = f.readline()
    if not line:
        raise ConnectionError("connection closed")
    t, rest = line[:1], line[1:-2]
    if t == b"+":
        return rest.decode()
    if t == b"-":
        raise RespError(rest.decode())
    if t == b":":
        return int(rest)
    if t == b"$":
        n = int(rest)
        if n == -1:
            return None
        data = f.read(n + 2)
        return data[:-2].decode()
    if t == b"*":
        n = int(rest)
        if n == -1:
            return None
        return [_read_reply(f) for _ in range(n)]
    raise RespError(f"protocol error: unexpected byte {t!r}")


# --------------------------------------------------------------- server state


class _Group:
    __slots__ = ("last_delivered", "pending", "consumers")

    def __init__(self, last_delivered: str):
        self.last_delivered = last_delivered
        # entry_id -> [consumer, delivery_time_ms, delivery_count]
        self.pending: dict[str, list] = {}
        self.consumers: set[str] = set()


class _Stream:
    __slots__ = ("entries", "groups", "last_id")

    def __init__(self):
        self.entries: list[tuple[str, dict[str, str]]] = []
        self.groups: dict[str, _Group] = {}
        # survives XDEL of the max entry: auto-ids stay monotonic
        self.last_id: str | None = None


def _flat_fields(fields: dict[str, str]) -> list[str]:
    out: list[str] = []
    for k, v in fields.items():
        out.extend((k, v))
    return out


def _parse_range_bound(s: str, *, is_start: bool) -> tuple[bool, tuple[int, int]]:
    """(exclusive, (ms, seq)) for an XRANGE bound. Bare-ms ids get
    seq 0 at the start bound and seq max at the end bound, per the
    Redis contract."""
    exclusive = s.startswith("(")
    if exclusive:
        s = s[1:]
    if s == "-":
        return exclusive, (0, 0)
    if s == "+":
        return exclusive, (2**63 - 1, 2**63 - 1)
    if "-" in s:
        ms, _, seq = s.partition("-")
        return exclusive, (int(ms), int(seq))
    return exclusive, (int(s), 0 if is_start else 2**63 - 1)


class _Commands:
    """The command table, state, and its lock — shared by every
    connection handler thread of one server."""

    def __init__(self):
        self.streams: dict[str, _Stream] = {}
        self.lock = threading.Lock()

    # every do_* runs under self.lock (dispatch acquires it)

    def do_ping(self, *args):
        return ("+", args[0] if args else "PONG")

    def do_client(self, *args):
        return ("+", "OK")

    def do_select(self, *args):
        return ("+", "OK")

    def do_del(self, *keys):
        n = sum(1 for k in keys if self.streams.pop(k, None) is not None)
        return n

    def do_exists(self, *keys):
        return sum(1 for k in keys if k in self.streams)

    def do_xlen(self, key):
        s = self.streams.get(key)
        return len(s.entries) if s else 0

    def do_xadd(self, key, *args):
        args = list(args)
        nomkstream = False
        maxlen = None
        while args:
            tok = args[0].upper()
            if tok == "NOMKSTREAM":
                nomkstream = True
                args.pop(0)
            elif tok == "MAXLEN":
                args.pop(0)
                if args and args[0] in ("~", "="):
                    args.pop(0)
                maxlen = int(args.pop(0))
            else:
                break
        entry_id = args.pop(0)
        if len(args) % 2 or not args:
            raise RespError("wrong number of arguments for 'xadd' command")
        fields = dict(zip(args[::2], args[1::2]))
        if key not in self.streams and nomkstream:
            return None
        s = self.streams.setdefault(key, _Stream())
        if entry_id == "*":
            eid = next_entry_id(s.last_id, int(time.time() * 1000))
        else:
            if "-" not in entry_id:
                entry_id = f"{entry_id}-0"
            if s.last_id is not None and entry_id_key(entry_id) <= entry_id_key(
                s.last_id
            ):
                raise RespError(
                    "The ID specified in XADD is equal or smaller than "
                    "the target stream top item"
                )
            eid = entry_id
        s.entries.append((eid, fields))
        s.last_id = eid
        if maxlen is not None:
            del s.entries[: max(0, len(s.entries) - maxlen)]
        return eid

    def do_xrange(self, key, start, end, *rest):
        count = None
        rest = list(rest)
        while rest:
            if rest[0].upper() == "COUNT":
                count = int(rest[1])
                rest = rest[2:]
            else:
                raise RespError(f"syntax error near '{rest[0]}'")
        s = self.streams.get(key)
        if not s:
            return []
        lo_ex, lo = _parse_range_bound(start, is_start=True)
        hi_ex, hi = _parse_range_bound(end, is_start=False)
        out = []
        for eid, fields in s.entries:
            k = entry_id_key(eid)
            if (k > lo if lo_ex else k >= lo) and (k < hi if hi_ex else k <= hi):
                out.append([eid, _flat_fields(fields)])
                if count is not None and len(out) >= count:
                    break
        return out

    def do_xtrim(self, key, *args):
        args = list(args)
        if not args or args[0].upper() != "MAXLEN":
            raise RespError("syntax error: XTRIM supports MAXLEN only")
        args.pop(0)
        if args and args[0] in ("~", "="):
            args.pop(0)
        maxlen = int(args.pop(0))
        s = self.streams.get(key)
        if not s:
            return 0
        drop = max(0, len(s.entries) - maxlen)
        del s.entries[:drop]
        return drop

    def do_xdel(self, key, *ids):
        s = self.streams.get(key)
        if not s:
            return 0
        drop = {i if "-" in i else f"{i}-0" for i in ids}
        before = len(s.entries)
        s.entries = [e for e in s.entries if e[0] not in drop]
        return before - len(s.entries)

    def do_xgroup(self, sub, *args):
        sub = sub.upper()
        if sub == "CREATE":
            key, group, start = args[0], args[1], args[2]
            mkstream = any(a.upper() == "MKSTREAM" for a in args[3:])
            s = self.streams.get(key)
            if s is None:
                if not mkstream:
                    raise RespError(
                        "The XGROUP subcommand requires the key to exist. "
                        "Note that for CREATE you may want to use the "
                        "MKSTREAM option to create an empty stream "
                        "automatically."
                    )
                s = self.streams.setdefault(key, _Stream())
            if group in s.groups:
                raise RespError(
                    "BUSYGROUP Consumer Group name already exists"
                )
            if start == "$":
                last = s.last_id or "0-0"
            else:
                last = start if "-" in start else f"{start}-0"
            s.groups[group] = _Group(last)
            return ("+", "OK")
        if sub == "DESTROY":
            key, group = args[0], args[1]
            s = self.streams.get(key)
            if s and s.groups.pop(group, None) is not None:
                return 1
            return 0
        if sub == "SETID":
            key, group, start = args[0], args[1], args[2]
            s = self.streams.get(key)
            g = s.groups.get(group) if s else None
            if g is None:
                raise RespError(
                    f"NOGROUP No such consumer group '{group}' for key "
                    f"name '{key}'"
                )
            if start == "$":
                g.last_delivered = s.last_id or "0-0"
            else:
                g.last_delivered = start if "-" in start else f"{start}-0"
            return ("+", "OK")
        raise RespError(f"unknown XGROUP subcommand '{sub}'")

    def _group(self, key: str, group: str) -> tuple[_Stream, _Group]:
        s = self.streams.get(key)
        g = s.groups.get(group) if s else None
        if g is None:
            raise RespError(
                f"NOGROUP No such consumer group '{group}' for key "
                f"name '{key}'"
            )
        return s, g

    def do_xreadgroup(self, *args):
        args = list(args)
        if args.pop(0).upper() != "GROUP":
            raise RespError("syntax error: expected GROUP")
        group, consumer = args.pop(0), args.pop(0)
        count = None
        while args and args[0].upper() in ("COUNT", "BLOCK", "NOACK"):
            tok = args.pop(0).upper()
            if tok == "COUNT":
                count = int(args.pop(0))
            elif tok == "BLOCK":
                args.pop(0)  # handled by the dispatch-level retry loop
        if not args or args.pop(0).upper() != "STREAMS":
            raise RespError("syntax error: expected STREAMS")
        half = len(args) // 2
        keys, ids = args[:half], args[half:]
        result = []
        now_ms = int(time.time() * 1000)
        for key, want in zip(keys, ids):
            s, g = self._group(key, group)
            g.consumers.add(consumer)
            if want == ">":
                lo = entry_id_key(g.last_delivered)
                msgs = []
                for eid, fields in s.entries:
                    if entry_id_key(eid) > lo:
                        msgs.append([eid, _flat_fields(fields)])
                        g.pending[eid] = [consumer, now_ms, 1]
                        g.last_delivered = eid
                        if count is not None and len(msgs) >= count:
                            break
                if msgs:
                    result.append([key, msgs])
            else:
                # replay THIS consumer's pending entries after `want`
                lo = entry_id_key(want if "-" in want else f"{want}-0")
                data = dict(s.entries)
                msgs = []
                for eid in sorted(g.pending, key=entry_id_key):
                    if entry_id_key(eid) > lo and g.pending[eid][0] == consumer:
                        f = data.get(eid)
                        msgs.append(
                            [eid, _flat_fields(f) if f is not None else None]
                        )
                        if count is not None and len(msgs) >= count:
                            break
                result.append([key, msgs])
        return result or None

    def do_xack(self, key, group, *ids):
        _s, g = self._group(key, group)
        return sum(
            1
            for i in ids
            if g.pending.pop(i if "-" in i else f"{i}-0", None) is not None
        )

    def do_xpending(self, key, group, *rest):
        _s, g = self._group(key, group)
        if not rest:  # summary form
            if not g.pending:
                return [0, None, None, None]
            ordered = sorted(g.pending, key=entry_id_key)
            per_consumer: dict[str, int] = {}
            for c, _t, _n in g.pending.values():
                per_consumer[c] = per_consumer.get(c, 0) + 1
            return [
                len(g.pending),
                ordered[0],
                ordered[-1],
                [[c, str(n)] for c, n in sorted(per_consumer.items())],
            ]
        rest = list(rest)
        idle_ms = 0
        if rest[0].upper() == "IDLE":
            rest.pop(0)
            idle_ms = int(rest.pop(0))
        start, end, count = rest[0], rest[1], int(rest[2])
        consumer = rest[3] if len(rest) > 3 else None
        lo_ex, lo = _parse_range_bound(start, is_start=True)
        hi_ex, hi = _parse_range_bound(end, is_start=False)
        now_ms = int(time.time() * 1000)
        out = []
        for eid in sorted(g.pending, key=entry_id_key):
            c, t, n = g.pending[eid]
            k = entry_id_key(eid)
            if not (k > lo if lo_ex else k >= lo):
                continue
            if not (k < hi if hi_ex else k <= hi):
                continue
            if consumer is not None and c != consumer:
                continue
            idle = now_ms - t
            if idle < idle_ms:
                continue
            out.append([eid, c, idle, n])
            if len(out) >= count:
                break
        return out

    def do_xautoclaim(self, key, group, consumer, min_idle, start, *rest):
        s, g = self._group(key, group)
        count = 100
        justid = False
        rest = list(rest)
        while rest:
            tok = rest.pop(0).upper()
            if tok == "COUNT":
                count = int(rest.pop(0))
            elif tok == "JUSTID":
                justid = True
        g.consumers.add(consumer)
        now_ms = int(time.time() * 1000)
        min_idle = int(min_idle)
        lo = entry_id_key(start if "-" in start else f"{start}-0")
        data = dict(s.entries)
        claimed, deleted = [], []
        cursor = "0-0"
        scanned = 0
        for eid in sorted(g.pending, key=entry_id_key):
            if entry_id_key(eid) < lo:
                continue
            c, t, n = g.pending[eid]
            if now_ms - t < min_idle:
                continue
            if eid not in data:
                # entry XDEL'd from the stream: drop from the PEL
                deleted.append(eid)
                del g.pending[eid]
                continue
            g.pending[eid] = [consumer, now_ms, n + (0 if justid else 1)]
            claimed.append(
                [eid] if justid else [eid, _flat_fields(data[eid])]
            )
            scanned += 1
            if scanned >= count:
                remaining = [
                    e
                    for e in g.pending
                    if entry_id_key(e) > entry_id_key(eid)
                ]
                if remaining:
                    cursor = min(remaining, key=entry_id_key)
                break
        return [cursor, claimed, deleted]

    def do_xinfo(self, sub, key, *rest):
        sub = sub.upper()
        s = self.streams.get(key)
        if s is None:
            raise RespError("no such key")
        if sub == "STREAM":
            first = s.entries[0] if s.entries else None
            last = s.entries[-1] if s.entries else None
            return [
                "length", len(s.entries),
                "last-generated-id", s.last_id or "0-0",
                "groups", len(s.groups),
                "first-entry",
                [first[0], _flat_fields(first[1])] if first else None,
                "last-entry",
                [last[0], _flat_fields(last[1])] if last else None,
            ]
        if sub == "GROUPS":
            out = []
            for name, g in sorted(s.groups.items()):
                lo = entry_id_key(g.last_delivered)
                lag = sum(1 for eid, _ in s.entries if entry_id_key(eid) > lo)
                out.append(
                    [
                        "name", name,
                        "consumers", len(g.consumers),
                        "pending", len(g.pending),
                        "last-delivered-id", g.last_delivered,
                        "lag", lag,
                    ]
                )
            return out
        raise RespError(f"unknown XINFO subcommand '{sub}'")

    def dispatch(self, argv: list[str]) -> Any:
        cmd = argv[0].lower()
        fn = getattr(self, f"do_{cmd}", None)
        if fn is None:
            return RespError(f"unknown command '{argv[0]}'")
        try:
            with self.lock:
                return fn(*argv[1:])
        except RespError as e:
            return e
        except TypeError:
            return RespError(f"wrong number of arguments for '{cmd}' command")


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        commands: _Commands = self.server.commands  # type: ignore[attr-defined]
        while True:
            try:
                req = _read_reply(self.rfile)
            except (ConnectionError, ValueError, OSError):
                return
            if not isinstance(req, list) or not req:
                self.wfile.write(
                    _encode_reply(RespError("protocol error: expected array"))
                )
                continue
            argv = [a if isinstance(a, str) else str(a) for a in req]
            reply = commands.dispatch(argv)
            # naive BLOCK support for XREADGROUP '>': poll until the
            # deadline when the immediate read found nothing
            if reply is None and argv[0].upper() == "XREADGROUP":
                deadline = self._block_deadline(argv)
                while reply is None and deadline and time.monotonic() < deadline:
                    time.sleep(0.01)
                    reply = commands.dispatch(argv)
            try:
                self.wfile.write(_encode_reply(reply))
            except OSError:
                return

    #: BLOCK 0 means "block forever" in Redis/Valkey; a truly
    #: unbounded poll could hang a test run on a consumer bug, so the
    #: embedded broker caps it at this finite ceiling (documented in
    #: docs/backends.md). Large enough that any consumer written
    #: against the reference's blocking-read pattern sees real
    #: blocking behavior, small enough to fail loudly instead of
    #: deadlocking CI.
    BLOCK_FOREVER_CAP_S = 30.0

    @classmethod
    def _block_deadline(cls, argv: list[str]) -> float | None:
        for i, a in enumerate(argv):
            if a.upper() == "BLOCK" and i + 1 < len(argv):
                ms = int(argv[i + 1])
                if ms <= 0:  # Redis semantics: BLOCK 0 blocks forever
                    return time.monotonic() + cls.BLOCK_FOREVER_CAP_S
                return time.monotonic() + ms / 1000.0
        return None


class _TCPServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class MiniValkeyServer:
    """In-process RESP2 stream broker for dev/CI (see module doc).

    >>> srv = MiniValkeyServer().start()
    >>> client = client_from_url(srv.url)
    >>> ...
    >>> srv.stop()
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._server = _TCPServer((host, port), _Handler)
        self._server.commands = _Commands()  # type: ignore[attr-defined]
        self.host, self.port = self._server.server_address[:2]
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"redis://{self.host}:{self.port}/0"

    def start(self) -> "MiniValkeyServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="mini-valkey", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)


# --------------------------------------------------------------- client


def _pairs_to_dict(flat: list | None) -> dict[str, str] | None:
    if flat is None:
        return None
    return dict(zip(flat[::2], flat[1::2]))


class _MiniPipeline:
    """Non-transactional pipeline: buffer commands, one socket write,
    N replies — the same round-trip amortization redis-py's gives
    xadd_rows. ``execute(raise_on_error=False)`` returns per-command
    errors in the result list instead of raising (redis-py parity) —
    the idempotent-producer path needs to treat an id-rejected XADD
    as 'already delivered', not a failure."""

    def __init__(self, client: "MiniRespClient"):
        self._client = client
        self._buf: list[tuple] = []

    def xadd(self, name, fields, id="*", maxlen=None):
        self._buf.append(self._client._xadd_args(name, fields, id, maxlen))

    def execute(self, raise_on_error: bool = True):
        out = self._client._execute_many(
            self._buf, raise_on_error=raise_on_error
        )
        self._buf = []
        return out


class MiniRespClient:
    """The redis-py surface this repo's live Valkey tier uses, over a
    plain socket. Return shapes mirror redis-py with
    decode_responses=True so call sites cannot tell them apart."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self._f = self._sock.makefile("rb")
        self._lock = threading.Lock()

    @classmethod
    def from_url(cls, url: str, decode_responses: bool = True) -> "MiniRespClient":
        rest = url.split("://", 1)[-1]
        if "@" in rest:
            # This client speaks no AUTH/HELLO; silently stripping
            # credentials would connect unauthenticated and fail
            # later with opaque NOAUTH errors on every command.
            raise RuntimeError(
                "authenticated redis:// URLs need the 'redis' package "
                "(MiniRespClient does not support AUTH)"
            )
        hostport = rest.split("/", 1)[0]
        host, _, port = hostport.partition(":")
        return cls(host or "127.0.0.1", int(port or 6379))

    def execute_command(self, *args) -> Any:
        return self._execute_many([args])[0]

    def _execute_many(
        self, commands: list[tuple], raise_on_error: bool = True
    ) -> list:
        with self._lock:
            self._sock.sendall(
                b"".join(_encode_command(c) for c in commands)
            )
            out = []
            err: RespError | None = None
            for _ in commands:
                try:
                    out.append(_read_reply(self._f))
                except RespError as e:  # drain remaining replies first
                    err = err or e
                    out.append(e)
            if err is not None and raise_on_error:
                raise err
            return out

    def close(self) -> None:
        try:
            self._f.close()
            self._sock.close()
        except OSError:
            pass

    # -- commands (redis-py shapes) --

    def ping(self) -> bool:
        return self.execute_command("PING") == "PONG"

    def delete(self, *names) -> int:
        return self.execute_command("DEL", *names)

    def xlen(self, name) -> int:
        return self.execute_command("XLEN", name)

    @staticmethod
    def _xadd_args(name, fields, id="*", maxlen=None) -> tuple:
        args: list = ["XADD", name]
        if maxlen is not None:
            args += ["MAXLEN", "~", maxlen]
        args.append(id)
        for k, v in fields.items():
            args += [k, v]
        return tuple(args)

    def xadd(self, name, fields, id="*", maxlen=None) -> str:
        return self.execute_command(*self._xadd_args(name, fields, id, maxlen))

    def xrange(self, name, min="-", max="+", count=None):
        args = ["XRANGE", name, min, max]
        if count is not None:
            args += ["COUNT", count]
        return [
            (eid, _pairs_to_dict(flat))
            for eid, flat in self.execute_command(*args)
        ]

    def xdel(self, name, *ids) -> int:
        return self.execute_command("XDEL", name, *ids)

    def xgroup_create(self, name, groupname, id="0", mkstream=False) -> bool:
        args = ["XGROUP", "CREATE", name, groupname, id]
        if mkstream:
            args.append("MKSTREAM")
        return self.execute_command(*args) == "OK"

    def xgroup_destroy(self, name, groupname) -> int:
        return self.execute_command("XGROUP", "DESTROY", name, groupname)

    def xgroup_setid(self, name, groupname, id) -> bool:
        return self.execute_command("XGROUP", "SETID", name, groupname, id) == "OK"

    def xtrim(self, name, maxlen, approximate=True) -> int:
        tilde = ("~",) if approximate else ("=",)
        return self.execute_command("XTRIM", name, "MAXLEN", *tilde, maxlen)

    def xreadgroup(self, groupname, consumername, streams, count=None, block=None):
        args = ["XREADGROUP", "GROUP", groupname, consumername]
        if count is not None:
            args += ["COUNT", count]
        if block is not None:
            args += ["BLOCK", block]
        args.append("STREAMS")
        args += list(streams.keys())
        args += list(streams.values())
        raw = self.execute_command(*args)
        if raw is None:
            return []
        return [
            [skey, [(eid, _pairs_to_dict(flat)) for eid, flat in msgs]]
            for skey, msgs in raw
        ]

    def xack(self, name, groupname, *ids) -> int:
        return self.execute_command("XACK", name, groupname, *ids)

    def xpending(self, name, groupname) -> dict:
        n, lo, hi, consumers = self.execute_command("XPENDING", name, groupname)
        return {
            "pending": n,
            "min": lo,
            "max": hi,
            "consumers": [
                {"name": c, "pending": int(cnt)} for c, cnt in (consumers or [])
            ],
        }

    def xpending_range(
        self, name, groupname, min, max, count, consumername=None, idle=None
    ):
        args = ["XPENDING", name, groupname]
        if idle is not None:
            args += ["IDLE", idle]
        args += [min, max, count]
        if consumername is not None:
            args.append(consumername)
        return [
            {
                "message_id": eid,
                "consumer": c,
                "time_since_delivered": idle_ms,
                "times_delivered": n,
            }
            for eid, c, idle_ms, n in self.execute_command(*args)
        ]

    def xautoclaim(
        self, name, groupname, consumername, min_idle_time, start_id="0-0",
        count=None, justid=False,
    ):
        args = ["XAUTOCLAIM", name, groupname, consumername, min_idle_time,
                start_id]
        if count is not None:
            args += ["COUNT", count]
        if justid:
            args.append("JUSTID")
        cursor, claimed, deleted = self.execute_command(*args)
        if justid:
            return cursor, [m[0] for m in claimed], deleted
        return (
            cursor,
            [(eid, _pairs_to_dict(flat)) for eid, flat in claimed],
            deleted,
        )

    def xinfo_stream(self, name) -> dict:
        return _pairs_to_mixed_dict(self.execute_command("XINFO", "STREAM", name))

    def xinfo_groups(self, name) -> list[dict]:
        return [
            _pairs_to_mixed_dict(flat)
            for flat in self.execute_command("XINFO", "GROUPS", name)
        ]

    def pipeline(self, transaction: bool = False) -> _MiniPipeline:
        return _MiniPipeline(self)


def _pairs_to_mixed_dict(flat: list) -> dict:
    return dict(zip(flat[::2], flat[1::2]))


def client_from_url(url: str):
    """A stream client for ``url``: redis-py when installed (full
    protocol), MiniRespClient otherwise (the subset above). Both
    speak real RESP — either works against a real server or against
    MiniValkeyServer."""
    try:
        import redis
    except ImportError:
        return MiniRespClient.from_url(url)
    return redis.Redis.from_url(url, decode_responses=True)
