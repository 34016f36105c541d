/**
 * Wire-level vitest suite for the grpc-web client.
 *
 * Parity with the reference's neumann-ts vitest coverage
 * (neumann-ts/src/client.test.ts): protobuf varint/string codecs,
 * grpc-web framing, trailer status handling, and full execute()/
 * executeStream()/health() calls against a mocked fetch. The same
 * wire cases are asserted from the server side by the in-image
 * Python suite (tests/test_ts_client_conformance.py); this file is
 * the Node-side half, run by CI (.github/workflows/ts-client.yml).
 */

import { describe, expect, it } from "vitest";

import {
  NeumannGrpcWebClient,
  NeumannGrpcWebError,
  Reader,
  decodeQueryResponse,
  deframe,
  frame,
  parseTrailers,
  writeStringField,
  writeVarint,
} from "./grpcweb";

// ---------------------------------------------------------------- codecs

describe("varint codec", () => {
  it("round-trips boundary values", () => {
    for (const v of [0, 1, 127, 128, 300, 16384, 2 ** 31, 2 ** 53 - 1]) {
      const out: number[] = [];
      writeVarint(out, v);
      expect(new Reader(Uint8Array.from(out)).varint()).toBe(v);
    }
  });

  it("single byte for < 128", () => {
    const out: number[] = [];
    writeVarint(out, 127);
    expect(out).toEqual([127]);
  });
});

describe("string fields", () => {
  it("encodes tag, length, utf-8 payload", () => {
    const out: number[] = [];
    writeStringField(out, 1, "hé");
    // field 1, wire type 2 => 0x0a; utf-8 "hé" is 3 bytes
    expect(out[0]).toBe(0x0a);
    expect(out[1]).toBe(3);
    const r = new Reader(Uint8Array.from(out));
    r.varint();
    expect(r.string()).toBe("hé");
  });
});

// --------------------------------------------------------------- framing

describe("grpc-web framing", () => {
  it("frame/deframe round-trip, multiple frames", () => {
    const a = frame(Uint8Array.from([1, 2, 3]));
    const b = frame(Uint8Array.from([9]));
    const joined = new Uint8Array(a.length + b.length);
    joined.set(a);
    joined.set(b, a.length);
    const frames = deframe(joined);
    expect(frames).toHaveLength(2);
    expect(Array.from(frames[0].payload)).toEqual([1, 2, 3]);
    expect(Array.from(frames[1].payload)).toEqual([9]);
    expect(frames[0].flag).toBe(0);
  });

  it("big-endian u32 length prefix", () => {
    const f = frame(new Uint8Array(258));
    expect(Array.from(f.subarray(0, 5))).toEqual([0, 0, 0, 1, 2]);
  });

  it("parses trailers", () => {
    const t = parseTrailers(
      new TextEncoder().encode("grpc-status: 0\r\ngrpc-message: ok"));
    expect(t["grpc-status"]).toBe("0");
    expect(t["grpc-message"]).toBe("ok");
  });
});

// -------------------------------------------------------------- response

function buildResponse(fields: Array<[number, Uint8Array | number]>):
  Uint8Array {
  const out: number[] = [];
  for (const [field, v] of fields) {
    if (typeof v === "number") {
      out.push((field << 3) | 0);
      writeVarint(out, v);
    } else {
      out.push((field << 3) | 2);
      writeVarint(out, v.length);
      for (const b of v) out.push(b);
    }
  }
  return Uint8Array.from(out);
}

const utf8 = (s: string) => new TextEncoder().encode(s);

describe("QueryResponse decoding", () => {
  it("decodes kind/message/count", () => {
    const res = decodeQueryResponse(buildResponse([
      [1, utf8("count")], [2, utf8("done")], [5, 42],
    ]));
    expect(res.kind).toBe("count");
    expect(res.message).toBe("done");
    expect(res.count).toBe(42);
  });

  it("decodes rows (nested json field)", () => {
    const row: number[] = [];
    writeStringField(row, 1, JSON.stringify({ id: 1, name: "a" }));
    const res = decodeQueryResponse(
      buildResponse([[1, utf8("rows")], [3, Uint8Array.from(row)]]));
    expect(res.rows).toEqual([{ id: 1, name: "a" }]);
  });

  it("decodes hits with float32 scores", () => {
    const hit: number[] = [];
    writeStringField(hit, 1, "k1");
    hit.push((2 << 3) | 5); // field 2, fixed32
    const dv = new DataView(new ArrayBuffer(4));
    dv.setFloat32(0, 0.5, true);
    hit.push(...new Uint8Array(dv.buffer));
    const res = decodeQueryResponse(
      buildResponse([[1, utf8("similar")], [4, Uint8Array.from(hit)]]));
    expect(res.hits).toEqual([{ key: "k1", score: 0.5 }]);
  });

  it("skips unknown fields", () => {
    const res = decodeQueryResponse(buildResponse([
      [12, utf8("future")], [1, utf8("value")], [6, utf8("null")],
    ]));
    expect(res.kind).toBe("value");
    expect(res.value).toBeNull();
  });
});

// ------------------------------------------------------------ full calls

function fetchReturning(body: Uint8Array): typeof fetch {
  return (async () => ({
    arrayBuffer: async () =>
      body.buffer.slice(body.byteOffset, body.byteOffset + body.length),
  })) as unknown as typeof fetch;
}

function okTrailer(): Uint8Array {
  const t = utf8("grpc-status: 0");
  const f = new Uint8Array(5 + t.length);
  f[0] = 0x80;
  new DataView(f.buffer).setUint32(1, t.length, false);
  f.set(t, 5);
  return f;
}

function concat(...parts: Uint8Array[]): Uint8Array {
  const total = parts.reduce((n, p) => n + p.length, 0);
  const out = new Uint8Array(total);
  let pos = 0;
  for (const p of parts) {
    out.set(p, pos);
    pos += p.length;
  }
  return out;
}

describe("NeumannGrpcWebClient", () => {
  it("execute() decodes a framed response", async () => {
    const payload = buildResponse([[1, utf8("count")], [5, 7]]);
    const client = new NeumannGrpcWebClient("http://x", {
      fetchImpl: fetchReturning(concat(frame(payload), okTrailer())),
    });
    const res = await client.execute("DELETE FROM t");
    expect(res.kind).toBe("count");
    expect(res.count).toBe(7);
  });

  it("execute() throws NeumannGrpcWebError on non-zero grpc-status",
     async () => {
    const t = utf8("grpc-status: 3\r\ngrpc-message: parse%20error");
    const trailer = new Uint8Array(5 + t.length);
    trailer[0] = 0x80;
    new DataView(trailer.buffer).setUint32(1, t.length, false);
    trailer.set(t, 5);
    const client = new NeumannGrpcWebClient("http://x", {
      fetchImpl: fetchReturning(trailer),
    });
    await expect(client.execute("BAD")).rejects.toThrowError(
      NeumannGrpcWebError);
    await expect(client.execute("BAD")).rejects.toThrow("parse error");
  });

  it("execute() surfaces in-band result errors", async () => {
    const payload = buildResponse([[7, utf8("boom")]]);
    const client = new NeumannGrpcWebClient("http://x", {
      fetchImpl: fetchReturning(concat(frame(payload), okTrailer())),
    });
    await expect(client.execute("X")).rejects.toThrow("boom");
  });

  it("executeStream() yields one result per frame", async () => {
    const p1 = buildResponse([[1, utf8("rows")]]);
    const p2 = buildResponse([[1, utf8("count")], [5, 2]]);
    const client = new NeumannGrpcWebClient("http://x", {
      fetchImpl: fetchReturning(
        concat(frame(p1), frame(p2), okTrailer())),
    });
    const out = await client.executeStream("SELECT 1");
    expect(out).toHaveLength(2);
    expect(out[1].count).toBe(2);
  });

  it("health() reads the serving bool", async () => {
    const body = Uint8Array.from([(1 << 3) | 0, 1]); // field 1 varint 1
    const client = new NeumannGrpcWebClient("http://x", {
      fetchImpl: fetchReturning(concat(frame(body), okTrailer())),
    });
    expect(await client.health()).toBe(true);
  });
});
