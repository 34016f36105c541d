/**
 * Zero-dependency gRPC-web client for browsers (uses fetch).
 *
 * Speaks the grpc-web protocol the server's HTTP facade implements
 * (neumann_tpu/server/grpc_web.py): POST /neumann.QueryService/<Method>
 * with application/grpc-web+proto framing — [flag u8][len u32 BE]
 * [payload], trailer frame flag 0x80. Protobuf encoding for the query
 * messages is hand-rolled (QueryRequest is one string field; the
 * response is strings/floats/varints), so no protobuf runtime is
 * needed — ideal for web bundles.
 */

// ---------------------------------------------------------------------------
// minimal protobuf wire helpers (exported for the vitest wire suite)
// ---------------------------------------------------------------------------

export function writeVarint(out: number[], v: number): void {
  while (v >= 0x80) {
    out.push((v & 0x7f) | 0x80);
    v = Math.floor(v / 128);
  }
  out.push(v);
}

export function writeStringField(out: number[], field: number, s: string): void {
  const bytes = new TextEncoder().encode(s);
  out.push((field << 3) | 2);
  writeVarint(out, bytes.length);
  for (const b of bytes) out.push(b);
}

export class Reader {
  pos = 0;
  constructor(readonly buf: Uint8Array) {}

  done(): boolean {
    return this.pos >= this.buf.length;
  }

  varint(): number {
    let v = 0;
    let shift = 1;
    for (;;) {
      const b = this.buf[this.pos++];
      v += (b & 0x7f) * shift;
      if ((b & 0x80) === 0) return v;
      shift *= 128;
    }
  }

  bytes(): Uint8Array {
    const len = this.varint();
    const out = this.buf.subarray(this.pos, this.pos + len);
    this.pos += len;
    return out;
  }

  string(): string {
    return new TextDecoder().decode(this.bytes());
  }

  float(): number {
    const v = new DataView(
      this.buf.buffer, this.buf.byteOffset + this.pos, 4
    ).getFloat32(0, true);
    this.pos += 4;
    return v;
  }

  skip(wireType: number): void {
    if (wireType === 0) this.varint();
    else if (wireType === 2) this.bytes();
    else if (wireType === 5) this.pos += 4;
    else if (wireType === 1) this.pos += 8;
    else throw new Error(`unsupported wire type ${wireType}`);
  }
}

// ---------------------------------------------------------------------------
// grpc-web framing
// ---------------------------------------------------------------------------

export function frame(payload: Uint8Array): Uint8Array {
  const out = new Uint8Array(5 + payload.length);
  out[0] = 0;
  new DataView(out.buffer).setUint32(1, payload.length, false);
  out.set(payload, 5);
  return out;
}

export interface Frame {
  flag: number;
  payload: Uint8Array;
}

export function deframe(body: Uint8Array): Frame[] {
  const frames: Frame[] = [];
  let pos = 0;
  while (pos + 5 <= body.length) {
    const flag = body[pos];
    const len = new DataView(
      body.buffer, body.byteOffset + pos + 1, 4
    ).getUint32(0, false);
    frames.push({ flag, payload: body.subarray(pos + 5, pos + 5 + len) });
    pos += 5 + len;
  }
  return frames;
}

export function parseTrailers(payload: Uint8Array): Record<string, string> {
  const out: Record<string, string> = {};
  for (const line of new TextDecoder().decode(payload).split("\r\n")) {
    const i = line.indexOf(":");
    if (i > 0) out[line.slice(0, i).trim()] = line.slice(i + 1).trim();
  }
  return out;
}

// ---------------------------------------------------------------------------
// messages
// ---------------------------------------------------------------------------

export interface Hit {
  key: string;
  score: number;
}

export interface WebQueryResult {
  kind: string;
  message: string;
  rows: Array<Record<string, unknown>>;
  hits: Hit[];
  count: number;
  value: unknown;
  error: string;
}

export function decodeHit(buf: Uint8Array): Hit {
  const r = new Reader(buf);
  const hit: Hit = { key: "", score: 0 };
  while (!r.done()) {
    const tag = r.varint();
    const field = tag >> 3;
    if (field === 1) hit.key = r.string();
    else if (field === 2) hit.score = r.float();
    else r.skip(tag & 7);
  }
  return hit;
}

export function decodeQueryResponse(buf: Uint8Array): WebQueryResult {
  const r = new Reader(buf);
  const out: WebQueryResult = {
    kind: "", message: "", rows: [], hits: [], count: 0,
    value: null, error: "",
  };
  while (!r.done()) {
    const tag = r.varint();
    const field = tag >> 3;
    if (field === 1) out.kind = r.string();
    else if (field === 2) out.message = r.string();
    else if (field === 3) {
      // Row { string json = 1 }
      const row = new Reader(r.bytes());
      while (!row.done()) {
        const t = row.varint();
        if (t >> 3 === 1) {
          out.rows.push(JSON.parse(row.string()));
        } else row.skip(t & 7);
      }
    } else if (field === 4) out.hits.push(decodeHit(r.bytes()));
    else if (field === 5) out.count = r.varint();
    else if (field === 6) {
      const v = r.string();
      out.value = v ? JSON.parse(v) : null;
    } else if (field === 7) out.error = r.string();
    else r.skip(tag & 7);
  }
  return out;
}

// ---------------------------------------------------------------------------
// client
// ---------------------------------------------------------------------------

export interface GrpcWebClientOptions {
  apiKey?: string;
  fetchImpl?: typeof fetch;
}

export class NeumannGrpcWebError extends Error {
  constructor(readonly status: number, message: string) {
    super(message);
  }
}

/** Browser client speaking grpc-web to the HTTP facade port. */
export class NeumannGrpcWebClient {
  private readonly fetchImpl: typeof fetch;

  constructor(
    private readonly baseUrl: string,
    private readonly opts: GrpcWebClientOptions = {},
  ) {
    this.fetchImpl = opts.fetchImpl ?? fetch;
  }

  private async call(path: string, payload: Uint8Array
  ): Promise<Uint8Array[]> {
    const headers: Record<string, string> = {
      "Content-Type": "application/grpc-web+proto",
      "x-grpc-web": "1",
    };
    if (this.opts.apiKey) headers["x-api-key"] = this.opts.apiKey;
    const resp = await this.fetchImpl(this.baseUrl + path, {
      method: "POST",
      headers,
      body: frame(payload),
    });
    const body = new Uint8Array(await resp.arrayBuffer());
    const frames = deframe(body);
    const trailerFrame = frames.find((f) => (f.flag & 0x80) !== 0);
    const trailers = trailerFrame
      ? parseTrailers(trailerFrame.payload)
      : {};
    const status = parseInt(trailers["grpc-status"] ?? "2", 10);
    if (status !== 0) {
      throw new NeumannGrpcWebError(
        status,
        decodeURIComponent(trailers["grpc-message"] ?? "rpc failed"),
      );
    }
    return frames.filter((f) => (f.flag & 0x80) === 0)
      .map((f) => f.payload);
  }

  /** QueryService/Execute. */
  async execute(query: string): Promise<WebQueryResult> {
    const req: number[] = [];
    writeStringField(req, 1, query);
    const msgs = await this.call(
      "/neumann.QueryService/Execute", Uint8Array.from(req));
    const res = decodeQueryResponse(msgs[0]);
    if (res.error) throw new NeumannGrpcWebError(3, res.error);
    return res;
  }

  /** QueryService/ExecuteStream — yields one result per frame. */
  async executeStream(query: string): Promise<WebQueryResult[]> {
    const req: number[] = [];
    writeStringField(req, 1, query);
    const msgs = await this.call(
      "/neumann.QueryService/ExecuteStream", Uint8Array.from(req));
    return msgs.map(decodeQueryResponse);
  }

  /** Health/Check. */
  async health(): Promise<boolean> {
    const msgs = await this.call("/neumann.Health/Check",
                                 new Uint8Array(0));
    const r = new Reader(msgs[0]);
    while (!r.done()) {
      const tag = r.varint();
      if (tag >> 3 === 1) return r.varint() !== 0;
      r.skip(tag & 7);
    }
    return false;
  }
}
