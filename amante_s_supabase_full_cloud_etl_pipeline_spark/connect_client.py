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

Scope (documented, loud): client-side streaming, Huffman-coded
trailer parsing, and flow-control back-pressure beyond a large
static window are not implemented — the purpose is an EXECUTED
serving leg (Config + ExecutePlan with Arrow results in
tests/test_connect_serve.py), not a production driver. HPACK is used
only on the encode side, as literal-without-indexing fields (always
legal per RFC 7541 §6.2.2); response HEADERS are not decoded — a
stream that ends without any DATA raises with the raw trailer bytes
for diagnosis.
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

#: our receive window — large enough that result streams in these
#: tests never stall on flow control
_WINDOW_SIZE = (1 << 31) - 1


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
    the h2 preface/SETTINGS exchange, PING keep-alives, gRPC message
    framing across DATA frames, and connection+stream flow-control
    windows sized so the response never stalls."""
    s = socket.create_connection((host, port), timeout=timeout)
    try:
        # SETTINGS: raise INITIAL_WINDOW_SIZE (id 4) so the one
        # stream we open gets the big window from the start
        settings = (4).to_bytes(2, "big") + _WINDOW_SIZE.to_bytes(4, "big")
        s.sendall(_PREFACE + _frame(_SETTINGS, 0, 0, settings))
        # connection-level window top-up (stream windows are covered
        # by the SETTINGS above)
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
        s.sendall(
            _frame(_HEADERS, _END_HEADERS, 1, headers)
            + _frame(_DATA, _END_STREAM, 1, grpc_msg)
        )

        buf = b""
        body = b""
        trailers = b""
        done = False
        deadline = time.monotonic() + timeout
        while not done:
            if time.monotonic() > deadline:
                raise GrpcCallError(f"gRPC call to {path} timed out")
            chunk = s.recv(1 << 16)
            if not chunk:
                raise GrpcCallError(f"connection closed mid-call to {path}")
            buf += chunk
            while len(buf) >= 9:
                ln = int.from_bytes(buf[:3], "big")
                ftype, flags = buf[3], buf[4]
                stream = int.from_bytes(buf[5:9], "big") & 0x7FFFFFFF
                if len(buf) < 9 + ln:
                    break
                payload, buf = buf[9 : 9 + ln], buf[9 + ln :]
                if ftype == _SETTINGS and not flags & _ACK:
                    s.sendall(_frame(_SETTINGS, _ACK, 0, b""))
                elif ftype == _PING and not flags & _ACK:
                    s.sendall(_frame(_PING, _ACK, 0, payload))
                elif ftype == _DATA and stream == 1:
                    body += payload
                    if flags & _END_STREAM:
                        done = True
                elif ftype in (_HEADERS, _CONT) and stream == 1:
                    trailers += payload
                    if flags & _END_STREAM:
                        done = True
                elif ftype == _RST:
                    raise GrpcCallError(
                        f"stream reset by server: {payload.hex()}"
                    )
                elif ftype == _GOAWAY:
                    raise GrpcCallError(
                        "GOAWAY: " + payload[8:].decode("utf-8", "replace")
                    )
        # split the gRPC length-prefixed message stream
        msgs = []
        pos = 0
        while pos < len(body):
            if body[pos] != 0:
                raise GrpcCallError("compressed gRPC message (unsupported)")
            mlen = int.from_bytes(body[pos + 1 : pos + 5], "big")
            msgs.append(body[pos + 5 : pos + 5 + mlen])
            pos += 5 + mlen
        if not msgs and trailers:
            # headers are HPACK-encoded (often Huffman): not decoded
            # here — surface the raw bytes for diagnosis
            raise GrpcCallError(
                f"no response messages; trailers: {trailers.hex()}"
            )
        return msgs
    finally:
        s.close()


def start_connect_server(spark, port: int | None = None) -> int:
    """Start the in-process Spark Connect gRPC service on the
    session's SparkContext (idempotent) and return its port."""
    jvm = spark._jvm
    if port is not None:
        spark.conf.set("spark.connect.grpc.binding.port", str(port))
    try:
        jvm.org.apache.spark.sql.connect.service.SparkConnectService.start(
            spark.sparkContext._jsc.sc()
        )
    except Exception as e:  # already running: that's fine
        if "already" not in str(e).lower():
            raise
    return int(spark.conf.get("spark.connect.grpc.binding.port", "15002"))
