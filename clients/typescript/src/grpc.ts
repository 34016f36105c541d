/**
 * gRPC client for the neumann-tpu server.
 *
 * Loads proto/neumann.proto at runtime via @grpc/proto-loader — the
 * message wire format matches the Python server exactly (the server
 * registers generic handlers under the same service/method paths).
 *
 * Parity with the reference's neumann-client surface: Execute /
 * ExecuteBatch / ExecutePaginated / ExecuteStream, Health.Check,
 * Points Upsert/Get/Delete/Query/Scroll, Collections Create/Get/Drop/List,
 * Blob streaming Upload/Download, API-key metadata, TLS.
 */

import * as grpc from "@grpc/grpc-js";
import * as protoLoader from "@grpc/proto-loader";
import * as path from "path";

const PROTO_PATH = path.join(__dirname, "..", "proto", "neumann.proto");

export interface GrpcClientOptions {
  apiKey?: string;
  /** PEM root cert; enables TLS when set. */
  tlsRootCert?: Buffer;
}

interface QueryResponse {
  kind: string;
  message: string;
  rows: Array<{ json: string }>;
  hits: Array<{ key: string; score: number }>;
  count: number;
  value_json: string;
  error: string;
}

function loadPackage(): Record<string, any> {
  const def = protoLoader.loadSync(PROTO_PATH, {
    keepCase: true,
    longs: Number,
    defaults: true,
  });
  return (grpc.loadPackageDefinition(def) as any).neumann;
}

export class NeumannGrpcClient {
  private query: any;
  private health: any;
  private points: any;
  private collections: any;
  private blob: any;
  private metadata: grpc.Metadata;

  constructor(address: string, options: GrpcClientOptions = {}) {
    const neumann = loadPackage();
    const creds = options.tlsRootCert
      ? grpc.credentials.createSsl(options.tlsRootCert)
      : grpc.credentials.createInsecure();
    this.query = new neumann.QueryService(address, creds);
    this.health = new neumann.Health(address, creds);
    this.points = new neumann.PointsService(address, creds);
    this.collections = new neumann.CollectionsService(address, creds);
    this.blob = new neumann.BlobService(address, creds);
    this.metadata = new grpc.Metadata();
    if (options.apiKey) {
      this.metadata.set("x-api-key", options.apiKey);
    }
  }

  private unary<T>(client: any, method: string, req: unknown): Promise<T> {
    return new Promise((resolve, reject) => {
      client[method](req, this.metadata, (err: Error | null, res: T) => {
        if (err) reject(err);
        else resolve(res);
      });
    });
  }

  /** Execute one statement; rows come back parsed from their JSON. */
  async execute(query: string, requestId = ""): Promise<{
    kind: string;
    message: string;
    rows: Array<Record<string, unknown>>;
    hits: Array<{ key: string; score: number }>;
    count: number;
    value: unknown;
    error: string;
  }> {
    const res = await this.unary<QueryResponse>(
      this.query, "Execute", { query, request_id: requestId });
    return {
      kind: res.kind,
      message: res.message,
      rows: (res.rows ?? []).map((r) => JSON.parse(r.json)),
      hits: res.hits ?? [],
      count: res.count,
      value: res.value_json ? JSON.parse(res.value_json) : null,
      error: res.error,
    };
  }

  /** Alias for execute() (the reference SDK documents both). */
  query(q: string, requestId = ""): ReturnType<NeumannGrpcClient["execute"]> {
    return this.execute(q, requestId);
  }

  executeBatch(queries: string[]): Promise<{ results: QueryResponse[] }> {
    return this.unary(this.query, "ExecuteBatch", {
      queries: queries.map((q) => ({ query: q, request_id: "" })),
    });
  }

  executePaginated(query: string, pageSize: number, cursor = ""):
      Promise<{ rows: Array<{ json: string }>; next_cursor: string }> {
    return this.unary(this.query, "ExecutePaginated",
                      { query, page_size: pageSize, cursor });
  }

  closeCursor(cursor: string): Promise<{ closed: boolean }> {
    return this.unary(this.query, "CloseCursor", { cursor });
  }

  /** Drain every page of a paginated query into one row list. */
  async executeAllPages(q: string, pageSize = 100):
      Promise<Array<Record<string, unknown>>> {
    const rows: Array<Record<string, unknown>> = [];
    let cursor = "";
    for (;;) {
      const page = await this.executePaginated(q, pageSize, cursor);
      for (const r of page.rows ?? []) rows.push(JSON.parse(r.json));
      if (!page.next_cursor) return rows;
      cursor = page.next_cursor;
    }
  }

  /** Begin a chain transaction; commit()/rollback() close it. */
  async beginTransaction(): Promise<{
    execute: (q: string) => ReturnType<NeumannGrpcClient["execute"]>;
    commit: () => Promise<void>;
    rollback: () => Promise<void>;
  }> {
    await this.execute("BEGIN CHAIN TRANSACTION");
    return {
      execute: (q: string) => this.execute(q),
      commit: async () => { await this.execute("COMMIT CHAIN"); },
      rollback: async () => { await this.execute("ROLLBACK CHAIN"); },
    };
  }

  /** Run fn inside a chain transaction: commit on success, rollback
   *  on throw (reference SDK's withTransaction). */
  async withTransaction<T>(
      fn: (tx: { execute: (q: string) =>
        ReturnType<NeumannGrpcClient["execute"]> }) => Promise<T>,
  ): Promise<T> {
    const tx = await this.beginTransaction();
    try {
      const out = await fn(tx);
      await tx.commit();
      return out;
    } catch (e) {
      await tx.rollback();
      throw e;
    }
  }

  /** Server-streamed rows for large results. */
  executeStream(query: string,
                onResponse: (res: QueryResponse) => void): Promise<void> {
    return new Promise((resolve, reject) => {
      const call = this.query.ExecuteStream({ query, request_id: "" },
                                            this.metadata);
      call.on("data", onResponse);
      call.on("end", resolve);
      call.on("error", reject);
    });
  }

  check(): Promise<{ ok: boolean; version: string; entries: number;
                     device: string }> {
    return this.unary(this.health, "Check", {});
  }

  // ---- points / collections ----------------------------------------------

  upsertPoints(collection: string, points: Array<{
    id: string; vector: number[]; payload?: Record<string, unknown>;
  }>): Promise<{ upserted: number; error: string }> {
    return this.unary(this.points, "Upsert", {
      collection,
      points: points.map((p) => ({
        id: p.id,
        vector: p.vector,
        payload_json: p.payload ? JSON.stringify(p.payload) : "",
      })),
    });
  }

  queryPoints(collection: string, vector: number[], limit = 10,
              filter?: unknown, withPayload = false, metric = ""):
      Promise<{ result: Array<{ id: string; score: number }> }> {
    return this.unary(this.points, "Query", {
      collection, vector, limit,
      filter_json: filter ? JSON.stringify(filter) : "",
      with_payload: withPayload, metric,
    });
  }

  /** Qdrant query_batch parity: many queries in one RPC, answered in
   *  order; a homogeneous batch runs as ONE batched device call
   *  server-side. */
  async queryPointsBatch(collection: string, vectors: number[][],
                         limit = 10, metric = ""):
      Promise<Array<Array<{ id: string; score: number }>>> {
    const resp: { responses: Array<{
      result: Array<{ id: string; score: number }>; error: string;
    }> } = await this.unary(this.points, "QueryBatch", {
      requests: vectors.map((vector, i) => ({
        collection, vector, limit, filter_json: "",
        with_payload: false, metric, req_id: i + 1,
      })),
    });
    return (resp.responses ?? []).map((r) => {
      if (r.error) throw new Error(r.error);
      return r.result ?? [];
    });
  }

  getPoints(collection: string, ids: string[]):
      Promise<{ points: Array<{ id: string; vector: number[] }> }> {
    return this.unary(this.points, "Get", { collection, ids });
  }

  deletePoints(collection: string, ids: string[]):
      Promise<{ deleted: number }> {
    return this.unary(this.points, "Delete", { collection, ids });
  }

  scrollPoints(collection: string, limit = 100, offsetId = ""):
      Promise<{ points: unknown[]; next_offset_id: string }> {
    return this.unary(this.points, "Scroll",
                      { collection, limit, offset_id: offsetId });
  }

  createCollection(name: string, dimension = 0, metric = "cosine",
                   quantization = "none"): Promise<{ ok: boolean }> {
    return this.unary(this.collections, "Create",
                      { name, dimension, metric, quantization });
  }

  getCollection(name: string):
      Promise<{ collection: unknown; error: string }> {
    return this.unary(this.collections, "Get", { name });
  }

  dropCollection(name: string): Promise<{ ok: boolean }> {
    return this.unary(this.collections, "Drop", { name });
  }

  listCollections(): Promise<{ collections: unknown[] }> {
    return this.unary(this.collections, "List", {});
  }

  // ---- blobs ---------------------------------------------------------------

  uploadBlob(name: string, contentType: string, data: Buffer,
             chunkSize = 256 * 1024):
      Promise<{ artifact_id: string; error: string }> {
    return new Promise((resolve, reject) => {
      const call = this.blob.Upload(
        this.metadata,
        (err: Error | null, res: { artifact_id: string; error: string }) =>
          err ? reject(err) : resolve(res));
      for (let off = 0; off < data.length; off += chunkSize) {
        call.write({
          name: off === 0 ? name : "",
          content_type: off === 0 ? contentType : "",
          data: data.subarray(off, off + chunkSize),
        });
      }
      call.end();
    });
  }

  downloadBlob(artifactId: string): Promise<Buffer> {
    return new Promise((resolve, reject) => {
      const chunks: Buffer[] = [];
      const call = this.blob.Download({ artifact_id: artifactId },
                                      this.metadata);
      call.on("data", (c: { data: Buffer }) => chunks.push(c.data));
      call.on("end", () => resolve(Buffer.concat(chunks)));
      call.on("error", reject);
    });
  }

  deleteBlob(artifactId: string): Promise<{ ok: boolean }> {
    return this.unary(this.blob, "Delete", { artifact_id: artifactId });
  }

  blobMetadata(artifactId: string): Promise<{
    id: string; name: string; size: number; checksum: string;
    content_type: string; tags: string[]; links: string[];
  }> {
    return this.unary(this.blob, "GetMetadata",
                      { artifact_id: artifactId });
  }

  close(): void {
    for (const c of [this.query, this.health, this.points,
                     this.collections, this.blob]) {
      grpc.closeClient(c);
    }
  }
}
