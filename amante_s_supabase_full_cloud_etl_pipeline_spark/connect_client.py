"""Minimal gRPC-over-HTTP/2 TRANSPORT for exercising the Spark
Connect serving endpoint without any Python gRPC stack — pure stdlib
sockets, the same zero-dependency pattern as the PostgreSQL v3 wire
client (``sources/pgwire.py``) and the Thrift/JDBC leg
(``serve.py`` + beeline).

Why this exists (SURVEY.md §2.1 S10): Power BI's newer Spark path and
every ``pyspark-connect`` client reach the engine through Spark
Connect (gRPC). The container has no ``grpcio``/``protobuf``, so the
usual client cannot run — but the CONNECT SERVER is JVM-side and
ships in every full Spark distribution (``spark-connect_2.13`` jar),
and gRPC's wire format is public (HTTP/2, RFC 9113 + HPACK RFC 7541 +
the gRPC PROTOCOL-HTTP2 spec): a unary/server-streaming call is a
connection preface, a SETTINGS exchange, one HPACK-encoded HEADERS
frame, length-prefixed protobuf messages in DATA frames, and HEADERS
trailers carrying ``grpc-status``.

Layering — the split keeps this module honest:
- THIS module is the TRANSPORT only: it moves serialized request
  bytes to a gRPC method path and returns the stream's serialized
  response messages. No protobuf schema knowledge lives here.
- Message CONSTRUCTION/PARSING in the tests uses the server's own
  generated classes (``org.apache.spark.connect.proto.*`` via py4j) —
  the authoritative codec, so a schema drift can never silently
  self-confirm.

Scope (documented, loud): client-side streaming is out; request DATA
is chunked to the server's advertised ``MAX_FRAME_SIZE`` and obeys
both the stream and connection send windows — a request larger than
the initial window streams out in waves as the server's
WINDOW_UPDATE frames replenish it (VERDICT r7 #8; a server that
never replenishes hits the call deadline, which reports the pending
byte count); trailer parsing handles the plain-text
HPACK literal forms gRPC-java actually emits (``grpc-status`` /
``grpc-message`` as incremental-indexing new-name literals — captured
live in tests) and skips Huffman-coded or table-referenced fields it
cannot resolve. Response flow control is pre-granted via a maximal
window, so large Arrow result streams never stall.
"""

from __future__ import annotations

import socket
import time

_PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

#: frame types (RFC 9113 §6)
_DATA, _HEADERS, _RST, _SETTINGS, _PING, _GOAWAY, _WINDOW, _CONT = (
    0, 1, 3, 4, 6, 7, 8, 9,
)

_END_STREAM = 0x1
_END_HEADERS = 0x4
_ACK = 0x1
_PADDED = 0x8
_PRIORITY = 0x20


def _frame_body(ftype: int, flags: int, payload: bytes) -> bytes:
    """The actual content of a DATA/HEADERS payload after stripping
    the optional PADDED (RFC 9113 §6.1/§6.2: leading pad-length byte
    + that many trailing pad octets) and, on HEADERS, PRIORITY
    (5-byte stream-dependency block) prefixes. gRPC-java does not
    pad today, but a padded frame spliced verbatim would inject the
    pad bytes into the gRPC message stream and silently mis-frame
    the Arrow results (ADVICE r7) — so malformed padding is a LOUD
    error, never a guess."""
    if flags & _PADDED:
        if not payload or payload[0] + 1 > len(payload):
            raise GrpcCallError(
                "malformed PADDED frame: pad length exceeds payload"
            )
        payload = payload[1 : len(payload) - payload[0]]
    if ftype == _HEADERS and flags & _PRIORITY:
        if len(payload) < 5:
            raise GrpcCallError(
                "malformed HEADERS frame: truncated priority block"
            )
        payload = payload[5:]
    return payload

#: our receive window — large enough that result streams never stall
_WINDOW_SIZE = (1 << 31) - 1

#: conservative defaults until the server's SETTINGS arrive (RFC 9113)
_DEFAULT_MAX_FRAME = 16_384
_DEFAULT_INITIAL_WINDOW = 65_535


def _frame(ftype: int, flags: int, stream: int, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(3, "big")
        + bytes([ftype, flags])
        + stream.to_bytes(4, "big")
        + payload
    )


def _hpack_literal(name: bytes, value: bytes) -> bytes:
    """One header as 'literal field without indexing, new name'
    (RFC 7541 §6.2.2) with plain (non-Huffman) strings — always valid,
    no dynamic-table state."""
    out = bytearray(b"\x00")
    for part in (name, value):
        n = len(part)
        if n < 127:
            out.append(n)
        else:  # 7-bit prefix varint continuation
            out.append(127)
            n -= 127
            while n >= 128:
                out.append(0x80 | (n & 0x7F))
                n >>= 7
            out.append(n)
        out += part
    return bytes(out)


def _hpack_plain_fields(block: bytes) -> dict[str, str]:
    """Best-effort HPACK decode for STATUS CHECKING: returns the
    literal fields whose name and value are plain-coded (the form
    gRPC-java emits for grpc-status/grpc-message — verified against
    live captures). Indexed fields, table-referenced names, and
    Huffman strings are structurally SKIPPED (lengths are always
    readable), never misread."""
    out: dict[str, str] = {}
    i = 0
    n = len(block)

    def read_int(prefix_bits: int) -> int:
        nonlocal i
        mask = (1 << prefix_bits) - 1
        v = block[i] & mask
        i += 1
        if v == mask:
            shift = 0
            while i < n:
                b = block[i]
                i += 1
                v += (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        return v

    def read_str():
        nonlocal i
        huff = block[i] & 0x80
        ln = read_int(7)
        s = block[i : i + ln]
        i += ln
        return None if huff else s

    try:
        while i < n:
            b = block[i]
            if b & 0x80:  # indexed field: just the index
                read_int(7)
                continue
            if b & 0xE0 == 0x20:  # dynamic table size update
                read_int(5)
                continue
            prefix = 6 if b & 0xC0 == 0x40 else 4  # incr-index / (never-)plain
            name_idx = read_int(prefix)
            name = read_str() if name_idx == 0 else None
            value = read_str()
            if name is not None and value is not None:
                out[name.decode("ascii", "replace")] = value.decode(
                    "utf-8", "replace"
                )
    except IndexError:
        pass  # torn block: keep what parsed
    return out


class GrpcCallError(RuntimeError):
    pass


def grpc_call(
    host: str,
    port: int,
    path: str,
    request: bytes,
    timeout: float = 60.0,
) -> list[bytes]:
    """One gRPC call: serialized ``request`` → the (possibly
    server-streamed) list of serialized response messages. Handles
    the h2 preface/SETTINGS exchange, PING keep-alives, DATA chunking
    to the server's max frame size, gRPC message framing across DATA
    frames, trailer ``grpc-status`` checking, and flow control (our
    receive window is pre-granted maximal; the request obeys the
    server's stream AND connection send windows, replenished by its
    WINDOW_UPDATE frames, so requests larger than the initial window
    stream out in waves). Raises :class:`GrpcCallError` on any
    failure, including timeout."""
    deadline = time.monotonic() + timeout
    s = socket.create_connection((host, port), timeout=timeout)
    try:
        settings = (4).to_bytes(2, "big") + _WINDOW_SIZE.to_bytes(4, "big")
        s.sendall(_PREFACE + _frame(_SETTINGS, 0, 0, settings))
        s.sendall(
            _frame(_WINDOW, 0, 0, (_WINDOW_SIZE - 65_535).to_bytes(4, "big"))
        )
        headers = b"".join(
            _hpack_literal(n, v)
            for n, v in (
                (b":method", b"POST"),
                (b":scheme", b"http"),
                (b":path", path.encode()),
                (b":authority", f"{host}:{port}".encode()),
                (b"content-type", b"application/grpc"),
                (b"te", b"trailers"),
            )
        )
        grpc_msg = b"\x00" + len(request).to_bytes(4, "big") + request
        s.sendall(_frame(_HEADERS, _END_HEADERS, 1, headers))

        # the request body waits for the server's SETTINGS so we
        # honor ITS max frame size and initial stream window
        server_max_frame = _DEFAULT_MAX_FRAME
        initial_window = _DEFAULT_INITIAL_WINDOW
        stream_window = _DEFAULT_INITIAL_WINDOW
        conn_window = _DEFAULT_INITIAL_WINDOW
        settings_seen = False
        send_off = 0

        buf = bytearray()
        body = bytearray()
        resp_headers = bytearray()
        trailers = bytearray()
        block = None  # (is_trailer, bytearray) while END_HEADERS unseen
        done = False

        def pump_request():
            """Send as much of the request body as flow control
            currently allows — bounded by BOTH the stream and the
            connection send window (RFC 9113 §5.2). WINDOW_UPDATE
            frames re-invoke it, so a request larger than the
            server's initial window streams out in waves instead of
            failing (VERDICT r7 #8); a server that never replenishes
            hits the call deadline, which reports the stall."""
            nonlocal send_off, stream_window, conn_window
            while send_off < len(grpc_msg):
                budget = min(server_max_frame, stream_window, conn_window)
                if budget <= 0:
                    return
                chunk = grpc_msg[send_off : send_off + budget]
                send_off += len(chunk)
                stream_window -= len(chunk)
                conn_window -= len(chunk)
                last = send_off >= len(grpc_msg)
                try:
                    s.sendall(
                        _frame(_DATA, _END_STREAM if last else 0, 1, chunk)
                    )
                except GrpcCallError:
                    raise
                except (socket.timeout, TimeoutError, OSError) as exc:
                    # sendall can block past the deadline when the
                    # kernel send buffer fills — the documented
                    # contract is GrpcCallError on ANY failure
                    raise GrpcCallError(
                        f"send failed mid-request to {path}: {exc!r}"
                    )

        while not done:
            remaining = deadline - time.monotonic()
            stalled = (
                f" ({len(grpc_msg) - send_off} request bytes still "
                "pending on flow control)"
                if send_off < len(grpc_msg)
                else ""
            )
            if remaining <= 0:
                raise GrpcCallError(f"gRPC call to {path} timed out{stalled}")
            s.settimeout(remaining)
            try:
                chunk = s.recv(1 << 16)
            except (socket.timeout, TimeoutError):
                raise GrpcCallError(f"gRPC call to {path} timed out{stalled}")
            if not chunk:
                raise GrpcCallError(f"connection closed mid-call to {path}")
            buf += chunk
            while len(buf) >= 9:
                ln = int.from_bytes(buf[:3], "big")
                ftype, flags = buf[3], buf[4]
                stream = int.from_bytes(buf[5:9], "big") & 0x7FFFFFFF
                if len(buf) < 9 + ln:
                    break
                payload = bytes(buf[9 : 9 + ln])
                del buf[: 9 + ln]
                if ftype == _SETTINGS and not flags & _ACK:
                    for off in range(0, len(payload) - 5, 6):
                        sid = int.from_bytes(payload[off : off + 2], "big")
                        val = int.from_bytes(payload[off + 2 : off + 6], "big")
                        if sid == 4:
                            # §6.9.2: a changed INITIAL_WINDOW_SIZE
                            # adjusts existing stream windows by the
                            # delta (the connection window is only
                            # ever grown by WINDOW_UPDATE)
                            stream_window += val - initial_window
                            initial_window = val
                        elif sid == 5:
                            server_max_frame = val
                    s.sendall(_frame(_SETTINGS, _ACK, 0, b""))
                    settings_seen = True
                    pump_request()
                elif ftype == _WINDOW:
                    incr = (
                        int.from_bytes(payload[:4], "big") & 0x7FFFFFFF
                        if len(payload) >= 4
                        else 0
                    )
                    if stream == 0:
                        conn_window += incr
                    elif stream == 1:
                        stream_window += incr
                    if settings_seen:
                        pump_request()
                elif ftype == _PING and not flags & _ACK:
                    s.sendall(_frame(_PING, _ACK, 0, payload))
                elif ftype == _DATA and stream == 1:
                    body += _frame_body(ftype, flags, payload)
                    if flags & _END_STREAM:
                        done = True
                elif ftype == _HEADERS and stream == 1:
                    block = (
                        bool(flags & _END_STREAM),
                        bytearray(_frame_body(ftype, flags, payload)),
                    )
                elif ftype == _CONT and stream == 1 and block is not None:
                    block[1].extend(payload)
                elif ftype == _RST:
                    raise GrpcCallError(
                        f"stream reset by server: {payload.hex()}"
                    )
                elif ftype == _GOAWAY:
                    raise GrpcCallError(
                        "GOAWAY: " + payload[8:].decode("utf-8", "replace")
                    )
                if block is not None and ftype in (_HEADERS, _CONT) and (
                    flags & _END_HEADERS
                ):
                    is_trailer, blk = block
                    (trailers if is_trailer else resp_headers).extend(blk)
                    if is_trailer:
                        done = True
                    block = None
                if done:
                    # the stream is complete: stop parsing buffered
                    # frames. A server that responds before the whole
                    # request body is sent (reachable now that large
                    # requests wait on flow control) legally follows
                    # its trailers with RST_STREAM(NO_ERROR) to cancel
                    # the unneeded rest (RFC 9113 §8.1) — processing
                    # that RST would mask the real response/grpc-status
                    break

        fields = _hpack_plain_fields(bytes(trailers))
        status = fields.get("grpc-status")
        if status is not None and status != "0":
            raise GrpcCallError(
                f"grpc-status {status} from {path}: "
                + fields.get("grpc-message", "(no plain-coded message)")
            )
        # split the gRPC length-prefixed message stream
        msgs = []
        pos = 0
        while pos < len(body):
            if body[pos] != 0:
                raise GrpcCallError("compressed gRPC message (unsupported)")
            mlen = int.from_bytes(body[pos + 1 : pos + 5], "big")
            msgs.append(bytes(body[pos + 5 : pos + 5 + mlen]))
            pos += 5 + mlen
        if not msgs and status is None and trailers:
            raise GrpcCallError(
                f"no response messages and no parseable grpc-status; "
                f"trailers: {bytes(trailers).hex()}"
            )
        return msgs
    finally:
        s.close()


def _service_module(spark):
    """The SparkConnectService Scala singleton (MODULE$): object
    members without static forwarders — ``localPort()`` among them —
    live on the module instance, not the companion class."""
    pkg = spark._jvm.org.apache.spark.sql.connect.service
    return getattr(getattr(pkg, "SparkConnectService$"), "MODULE$")


def start_connect_server(spark) -> int:
    """Start the in-process Spark Connect gRPC service on the
    session's SparkContext (idempotent — the service logs and
    returns when already running) and return the port it actually
    LISTENS on (``localPort``, not a conf echo: the binding port is a
    SparkConf read at service start, so a runtime-conf write could
    not change it anyway)."""
    jvm = spark._jvm
    jvm.org.apache.spark.sql.connect.service.SparkConnectService.start(
        spark.sparkContext._jsc.sc()
    )
    return int(_service_module(spark).localPort())


def stop_connect_server(spark) -> None:
    """Stop the in-process Connect service (Scala default args
    forwarded explicitly — py4j has no default-argument support)."""
    mod = _service_module(spark)
    mod.stop(
        getattr(mod, "stop$default$1")(), getattr(mod, "stop$default$2")()
    )
