"""Network query-service façade (SURVEY §2A W1).

The reference serves time-series scans over a finagle binary protocol:
clients Open a scan (getting a scanner handle), pull row batches, and
Close (marketdb-api/.../api/MarketDbProtocol.scala:17-203, served at
marketdb-app/.../MarketDbApp.scala:47-53). This is the same service
surface on plain TCP + newline-delimited JSON (stdlib only — no finagle,
no thrift): a threaded socket server in the Spark DRIVER process that
plans scans with the lazy-DataFrame façade (client.MarketDb) and streams
results back.

Protocol (one JSON object per line, request → response(s)):

  {"op": "trades",  "market": M, "security": S, "interval": [a, b]}
      → one line per row, then {"done": <row count>}
  {"op": "orders",  ...same}                    → same shape
  {"op": "count",   "kind": "trades", ...}      → {"count": n}
  {"op": "open",    "kind": "trades", ...}      → {"scan_id": id}
  {"op": "next",    "scan_id": id, "n": 100}    → rows… then
                                                   {"batch_end": k, "exhausted": bool}
  {"op": "close",   "scan_id": id}              → {"closed": true}

The cursor ops mirror the reference's Open/ReadRows/Close scanner
lifecycle; `next` pulls from a server-side ``toLocalIterator`` so only
the requested batch is materialized driver-side — the executor-side scan
stays lazy/partition-streamed exactly like the in-process path.

Scale note: this façade is a control-plane convenience (the reference's
own deployment shape — one service fronting the store). Bulk analytics
should go through the DataFrame API directly; the server never collects
more than the batch a client asked for.

BULK DATA LANE (op "fetch_arrow"): row-per-JSON-line is a control-plane
format, not a data plane — for bulk pulls the server streams the same
scan as ARROW IPC instead: one JSON header line, then u32-BE-framed
independent Arrow IPC streams (one per record batch of ``batch_rows``
rows, schema repeated per frame so each frame is self-describing), then
a zero-length frame as terminator. Memory stays bounded to one batch on
both ends (the server still pulls from toLocalIterator), and the client
gets typed columnar batches it can hand to pandas/duckdb zero-parse —
the shape the reference's finagle byte-batches wanted to be.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from marketdb_spark.client import MarketDb


def _json_default(v: Any) -> str:
    return str(v)  # timestamps/decimals → ISO-ish strings


def _arrow_schema(df: DataFrame):
    """The scan's Arrow schema with every timestamp — including ones
    nested in struct/list/map columns — as naive microseconds: Row
    values from toLocalIterator carry session-local naive datetimes at
    any nesting depth, so a tz-stamped arrow field would reinterpret
    them."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    def strip_tz(t: "pa.DataType") -> "pa.DataType":
        if pa.types.is_timestamp(t):
            return pa.timestamp(t.unit)
        if pa.types.is_struct(t):
            return pa.struct(
                [f.with_type(strip_tz(f.type)) for f in t]
            )
        if pa.types.is_list(t):
            return pa.list_(strip_tz(t.value_type))
        if pa.types.is_large_list(t):
            return pa.large_list(strip_tz(t.value_type))
        if pa.types.is_map(t):
            return pa.map_(strip_tz(t.key_type), strip_tz(t.item_type))
        return t

    return pa.schema(
        [f.with_type(strip_tz(f.type)) for f in to_arrow_schema(df.schema)]
    )


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        server: MarketDbServer = self.server  # type: ignore[assignment]
        try:
            for raw in self.rfile:
                line = raw.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                    for out in server.dispatch(req):
                        if isinstance(out, tuple) and out[0] == "frame":
                            self._send_frame(out[1])
                        else:
                            self._send(out)
                except (BrokenPipeError, ConnectionResetError):
                    raise  # handled once, below — the client is gone
                except Exception as exc:  # malformed request must not kill the server
                    self._send({"error": f"{type(exc).__name__}: {exc}"})
        except (BrokenPipeError, ConnectionResetError):
            # the CLIENT hung up (mid-request or mid-response frame):
            # nothing to report and nobody to report it to — end this
            # handler quietly, the threaded server keeps serving other
            # connections
            return

    def _send(self, obj: dict) -> None:
        self.wfile.write(json.dumps(obj, default=_json_default).encode() + b"\n")
        self.wfile.flush()

    def _send_frame(self, payload: bytes) -> None:
        # u32-BE length prefix; zero length = end of frame sequence
        self.wfile.write(len(payload).to_bytes(4, "big") + payload)
        self.wfile.flush()


class _ThreadedTCPServer(socketserver.ThreadingTCPServer):
    daemon_threads = True
    allow_reuse_address = True


class MarketDbServer:
    """Serve MarketDb scans over TCP/ndjson. Runs inside the Spark driver
    (the reference's MarketDbApp is likewise one process fronting the
    store). ``port=0`` picks an ephemeral port — read ``self.port``."""

    def __init__(
        self,
        spark: SparkSession,
        trades_path: str,
        orders_path: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.db = MarketDb(spark, trades_path=trades_path, orders_path=orders_path)
        self._scans: dict[int, Any] = {}
        self._next_scan = 1
        self._lock = threading.Lock()
        self._tcp = _ThreadedTCPServer((host, port), _Handler)
        self._tcp.dispatch = self.dispatch  # handler looks this up per request
        self.host, self.port = self._tcp.server_address
        self._thread = threading.Thread(target=self._tcp.serve_forever, daemon=True)

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "MarketDbServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()

    def __enter__(self) -> "MarketDbServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- request dispatch (yields response objects) -------------------------
    def _series(self, req: dict) -> DataFrame:
        kind = req.get("kind", req.get("op"))
        fn = self.db.trades if kind == "trades" else self.db.orders
        return fn(req["market"], req["security"], tuple(req["interval"]))

    def dispatch(self, req: dict):
        op = req.get("op")
        if op in ("trades", "orders"):
            n = 0
            for row in self._series(req).toLocalIterator():
                n += 1
                yield row.asDict(recursive=True)
            yield {"done": n}
        elif op == "count":
            yield {"count": self._series(req).count()}
        elif op == "open":
            # the reference's Open → ScannerDescriptor handle; the scan
            # carries its own lock so concurrent `next`s on one scan_id
            # serialize (a shared toLocalIterator is not thread-safe —
            # interleaved next() calls would split rows across batches)
            scan = self._series(req).toLocalIterator()
            with self._lock:
                scan_id = self._next_scan
                self._next_scan += 1
                self._scans[scan_id] = (scan, threading.Lock())
            yield {"scan_id": scan_id}
        elif op == "next":
            entry = self._scans.get(req["scan_id"])
            if entry is None:
                yield {"error": "unknown scan_id"}
                return
            it, scan_lock = entry
            want = int(req.get("n", 100))
            rows: list[Any] = []
            with scan_lock:
                exhausted = False
                while len(rows) < want:
                    try:
                        rows.append(next(it))
                    except StopIteration:
                        exhausted = True
                        break
                if exhausted:
                    self._scans.pop(req["scan_id"], None)
            for row in rows:
                yield row.asDict(recursive=True)
            yield {"batch_end": len(rows), "exhausted": exhausted}
        elif op == "fetch_arrow":
            yield from self._fetch_arrow(req)
        elif op == "close":
            self._scans.pop(req.get("scan_id"), None)
            yield {"closed": True}
        else:
            yield {"error": f"unknown op {op!r}"}

    def _fetch_arrow(self, req: dict):
        """Bulk lane: the scan as u32-framed Arrow IPC streams (one per
        record batch, self-describing), zero-length frame terminates,
        then ONE JSON status line ({"frames_done": k} | {"error": ...}).
        Pulls from toLocalIterator, so server memory is one batch.

        Errors after the header must stay IN-BAND: a raw JSON error line
        where the client expects a length prefix would be read as a
        bogus u32 and hang the connection — so a mid-stream failure
        still sends the zero terminator and reports through the status
        line (the client re-raises it instead of returning a silently
        truncated table)."""
        import io

        import pyarrow as pa

        df = self._series(req)
        schema = _arrow_schema(df)
        batch_rows = max(int(req.get("batch_rows", 4096)), 1)
        yield {
            "arrow_frames": True,
            "framing": "u32be",
            "schema": str(schema),
        }
        done = 0
        try:
            buf: list[dict] = []

            def frame(rows: list[dict]) -> tuple:
                batch = pa.RecordBatch.from_pylist(rows, schema=schema)
                sink = io.BytesIO()
                with pa.ipc.new_stream(sink, schema) as w:
                    w.write_batch(batch)
                return ("frame", sink.getvalue())

            for row in df.toLocalIterator():
                buf.append(row.asDict(recursive=True))
                if len(buf) >= batch_rows:
                    yield frame(buf)
                    done += 1
                    buf = []
            # an EMPTY scan still emits one zero-row frame: the IPC
            # stream is the schema's authoritative wire form, so the
            # client materializes a typed-empty table instead of a
            # column-less pa.table({})
            if buf or done == 0:
                yield frame(buf)
                done += 1
        except Exception as exc:
            yield ("frame", b"")
            yield {"error": f"{type(exc).__name__}: {exc}"}
            return
        yield ("frame", b"")
        yield {"frames_done": done}


def fetch_arrow(host: str, port: int, req: dict, timeout: float = 60.0):
    """Bulk-lane client: send one fetch_arrow request, return the result
    as a pyarrow Table (concatenation of the framed record batches).
    Short reads raise ConnectionError (a dropped server must never look
    like a clean terminator → silently truncated table), and the
    trailing status line re-raises mid-stream server failures."""
    import pyarrow as pa

    def read_exact(rfile, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = rfile.read(n - len(buf))
            if not chunk:
                raise ConnectionError(
                    f"fetch_arrow stream truncated: expected {n} bytes, "
                    f"got {len(buf)} before EOF"
                )
            buf += chunk
        return buf

    req = {**req, "op": "fetch_arrow"}
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.sendall(json.dumps(req).encode() + b"\n")
        rfile = sock.makefile("rb")
        header = json.loads(rfile.readline())
        if "error" in header:
            raise RuntimeError(header["error"])
        if header.get("framing") != "u32be":
            # explicit raise, not assert: `python -O` strips asserts and
            # a mismatched server would then surface as a confusing
            # downstream framing error
            raise RuntimeError(f"unexpected fetch_arrow framing: {header}")
        batches = []
        schema = None
        while True:
            n = int.from_bytes(read_exact(rfile, 4), "big")
            if n == 0:
                break
            with pa.ipc.open_stream(read_exact(rfile, n)) as r:
                schema = schema or r.schema
                batches.extend(r)
        status_line = rfile.readline()
        if not status_line:
            raise ConnectionError(
                "fetch_arrow stream truncated: no status line after the "
                "terminator"
            )
        status = json.loads(status_line)
        if "error" in status:
            raise RuntimeError(status["error"])
        if not batches:
            # pre-typed-empty servers only (current ones always frame the
            # schema); fall back to a schema-bearing empty table if any
            # frame announced one
            return pa.table({}) if schema is None else schema.empty_table()
        return pa.Table.from_batches(batches, schema=schema)


def request(host: str, port: int, req: dict, timeout: float = 60.0) -> list[dict]:
    """Tiny client: send one request, read response lines until the
    terminator ({'done'|'count'|'scan_id'|'batch_end'|'closed'|'error'})."""
    terminators = {"done", "count", "scan_id", "batch_end", "closed", "error"}
    out: list[dict] = []
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.sendall(json.dumps(req).encode() + b"\n")
        buf = sock.makefile("r")
        for line in buf:
            obj = json.loads(line)
            out.append(obj)
            if terminators & obj.keys():
                break
    return out
