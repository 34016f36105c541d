"""gRPC-web gateway: wire-protocol tests against a live REST port.

Frames are crafted per grpc/grpc-web PROTOCOL.md: [flag][u32 len][payload]
with flag 0x80 marking the trailer block. Covers binary and base64 text
modes, unary + server-streaming + client-streaming methods, auth
enforcement through the shared handler stack, and protocol errors.
"""

import base64
import http.client

import pytest

from neumann_tpu.server import neumann_pb2 as pb
from neumann_tpu.server.grpc_web import decode_frames, encode_frame
from neumann_tpu.server.rest import RestServer
from neumann_tpu.server.server import NeumannServer


def _post(port, path, body, ctype="application/grpc-web+proto",
          headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    hdrs = {"Content-Type": ctype}
    hdrs.update(headers or {})
    conn.request("POST", path, body, hdrs)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def _trailers(payload: bytes) -> dict:
    out = {}
    for line in payload.decode().split("\r\n"):
        if ":" in line:
            k, v = line.split(":", 1)
            out[k.strip()] = v.strip()
    return out


@pytest.fixture(scope="module")
def stack():
    srv = NeumannServer()
    rest = RestServer(router=srv.router, grpc_web=srv)
    rest.serve()
    srv.router.execute("CREATE TABLE t (id INT)")
    srv.router.execute("INSERT INTO t VALUES (1)")
    yield srv, rest
    rest.stop()
    srv.stop()


def test_unary_binary(stack):
    srv, rest = stack
    req = pb.QueryRequest(query="SELECT * FROM t").SerializeToString()
    resp, data = _post(rest.port, "/neumann.QueryService/Execute",
                       encode_frame(0x00, req))
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "application/grpc-web+proto"
    frames = decode_frames(data)
    assert [f for f, _ in frames] == [0x00, 0x80]
    msg = pb.QueryResponse.FromString(frames[0][1])
    assert msg.rows and not msg.error
    assert _trailers(frames[1][1])["grpc-status"] == "0"


def test_unary_text_mode(stack):
    srv, rest = stack
    req = pb.QueryRequest(query="SELECT * FROM t").SerializeToString()
    body = base64.b64encode(encode_frame(0x00, req))
    resp, data = _post(rest.port, "/neumann.QueryService/Execute",
                       body, ctype="application/grpc-web-text")
    frames = decode_frames(base64.b64decode(data))
    assert [f for f, _ in frames] == [0x00, 0x80]
    assert pb.QueryResponse.FromString(frames[0][1]).rows


def test_server_streaming(stack):
    srv, rest = stack
    for i in range(2, 6):
        srv.router.execute(f"INSERT INTO t VALUES ({i})")
    req = pb.QueryRequest(query="SELECT * FROM t").SerializeToString()
    resp, data = _post(rest.port, "/neumann.QueryService/ExecuteStream",
                       encode_frame(0x00, req))
    frames = decode_frames(data)
    assert frames[-1][0] == 0x80
    assert _trailers(frames[-1][1])["grpc-status"] == "0"
    assert all(f == 0x00 for f, _ in frames[:-1]) and len(frames) >= 2


def test_client_streaming_blob_upload(stack):
    srv, rest = stack
    chunks = [pb.BlobChunk(name="web.bin", data=b"abc"),
              pb.BlobChunk(name="web.bin", data=b"def")]
    body = b"".join(encode_frame(0x00, c.SerializeToString())
                    for c in chunks)
    resp, data = _post(rest.port, "/neumann.BlobService/Upload", body)
    frames = decode_frames(data)
    assert _trailers(frames[-1][1])["grpc-status"] == "0"
    out = pb.BlobUploadResponse.FromString(frames[0][1])
    assert out.artifact_id and not out.error


def test_unknown_method(stack):
    srv, rest = stack
    resp, data = _post(rest.port, "/neumann.QueryService/Nope",
                       encode_frame(0x00, b""))
    frames = decode_frames(data)
    assert len(frames) == 1 and frames[0][0] == 0x80
    assert _trailers(frames[0][1])["grpc-status"] == "12"  # UNIMPLEMENTED


def test_malformed_frame(stack):
    srv, rest = stack
    resp, data = _post(rest.port, "/neumann.QueryService/Execute",
                       b"\x00\x00\x00\x00\x09trunc")
    frames = decode_frames(data)
    assert _trailers(frames[0][1])["grpc-status"] == "3"  # INVALID_ARGUMENT


def test_query_error_in_response_message(stack):
    srv, rest = stack
    req = pb.QueryRequest(query="SELECT * FROM nope").SerializeToString()
    resp, data = _post(rest.port, "/neumann.QueryService/Execute",
                       encode_frame(0x00, req))
    frames = decode_frames(data)
    msg = pb.QueryResponse.FromString(frames[0][1])
    assert msg.error  # NeumannError travels in the response, status OK
    assert _trailers(frames[1][1])["grpc-status"] == "0"


def test_auth_enforced_over_web():
    srv = NeumannServer(api_keys=["sekret"])
    rest = RestServer(router=srv.router, grpc_web=srv)
    rest.serve()
    try:
        req = pb.QueryRequest(query="SELECT 1").SerializeToString()
        resp, data = _post(rest.port, "/neumann.QueryService/Execute",
                           encode_frame(0x00, req))
        frames = decode_frames(data)
        assert len(frames) == 1
        assert _trailers(frames[0][1])["grpc-status"] == "16"  # UNAUTH
        resp, data = _post(rest.port, "/neumann.QueryService/Execute",
                           encode_frame(0x00, req),
                           headers={"x-api-key": "sekret"})
        frames = decode_frames(data)
        assert _trailers(frames[-1][1])["grpc-status"] == "0"
    finally:
        rest.stop()
        srv.stop()


def test_cors_preflight(stack):
    srv, rest = stack
    conn = http.client.HTTPConnection("127.0.0.1", rest.port, timeout=10)
    conn.request("OPTIONS", "/neumann.QueryService/Execute", None,
                 {"Origin": "http://app.example",
                  "Access-Control-Request-Method": "POST"})
    resp = conn.getresponse()
    resp.read()
    conn.close()
    assert resp.status == 204
    assert resp.getheader("Access-Control-Allow-Origin") == "*"
    assert "x-api-key" in resp.getheader("Access-Control-Allow-Headers")


def test_rest_json_still_routes(stack):
    srv, rest = stack
    conn = http.client.HTTPConnection("127.0.0.1", rest.port, timeout=10)
    conn.request("POST", "/query", b'{"query": "SELECT * FROM t"}',
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    import json

    assert json.loads(resp.read())["rows"]
    conn.close()


def test_decode_empty_payload_frame():
    # a 5-byte frame (empty payload) at the end of the buffer counts
    assert decode_frames(encode_frame(0x80, b"")) == [(0x80, b"")]


def test_percent_encode_boundaries():
    from neumann_tpu.server.grpc_web import _percent_encode

    # space and tilde pass through; %, DEL, control, non-ASCII encode
    assert _percent_encode(" a~%\x19\x7fé") == \
        " a~%25%19%7F%C3%A9"
