/**
 * Zero-dependency REST client for the neumann-tpu server (uses fetch).
 *
 * Covers every route of server/rest.py: /query, /health, /metrics and
 * the Qdrant-style /collections API. Parity with the reference's
 * neumann-ts SDK surface.
 */

export interface QueryResult {
  kind: string;
  message: string | null;
  rows: Array<Record<string, unknown>> | null;
  hits: Array<{ key: string; score: number }> | null;
  count: number | null;
  value: unknown;
}

export interface Health {
  ok: boolean;
  entries: number;
  device: string;
}

export interface CollectionConfig {
  dimension?: number;
  metric?: "cosine" | "dot" | "euclidean" | "manhattan" | "composite"
    | "weighted_jaccard" | "angular" | "geodesic" | "jaccard" | "overlap";
  quantization?: "none" | "int8" | "binary" | "pq" | "tt";
}

export interface Point {
  id: string | number;
  vector: number[];
  payload?: Record<string, unknown>;
}

export interface ScoredPoint {
  id: string;
  score: number;
}

/** FilterCondition tree, mirroring engines/vector.FilterCondition. */
export type Filter =
  | { op: "eq" | "ne" | "lt" | "le" | "gt" | "ge" | "contains"
      | "starts_with"; field: string; value: unknown }
  | { op: "in"; field: string; value: unknown[] }
  | { op: "exists"; field: string }
  | { op: "and" | "or"; left: Filter; right: Filter };

export class NeumannRestError extends Error {
  constructor(public status: number, message: string) {
    super(message);
    this.name = "NeumannRestError";
  }
}

export class NeumannRestClient {
  constructor(private baseUrl: string,
              private fetchImpl: typeof fetch = fetch) {
    this.baseUrl = baseUrl.replace(/\/+$/, "");
  }

  private async call<T>(method: string, path: string,
                        body?: unknown): Promise<T> {
    const res = await this.fetchImpl(`${this.baseUrl}${path}`, {
      method,
      headers: body !== undefined
        ? { "Content-Type": "application/json" } : undefined,
      body: body !== undefined ? JSON.stringify(body) : undefined,
    });
    const text = await res.text();
    let parsed: unknown;
    try {
      parsed = JSON.parse(text);
    } catch {
      parsed = { error: text };
    }
    if (!res.ok) {
      const msg = (parsed as { error?: string }).error ?? res.statusText;
      throw new NeumannRestError(res.status, msg);
    }
    return parsed as T;
  }

  /** Execute any query-language statement. */
  query(query: string): Promise<QueryResult> {
    return this.call("POST", "/query", { query });
  }

  health(): Promise<Health> {
    return this.call("GET", "/health");
  }

  metrics(): Promise<{
    statements: Record<string, unknown>;
    slow_queries: unknown[];
  }> {
    return this.call("GET", "/metrics");
  }

  // ---- collections -------------------------------------------------------

  listCollections(): Promise<{ collections: unknown[] }> {
    return this.call("GET", "/collections");
  }

  createCollection(name: string,
                   config: CollectionConfig = {}): Promise<{ ok: boolean }> {
    return this.call("PUT", `/collections/${encodeURIComponent(name)}`,
                     config);
  }

  dropCollection(name: string): Promise<{ ok: boolean }> {
    return this.call("DELETE",
                     `/collections/${encodeURIComponent(name)}`);
  }

  upsertPoints(collection: string,
               points: Point[]): Promise<{ upserted: number }> {
    return this.call(
      "PUT", `/collections/${encodeURIComponent(collection)}/points`,
      { points });
  }

  queryPoints(collection: string, vector: number[], limit = 10,
              filter?: Filter): Promise<{ result: ScoredPoint[] }> {
    return this.call(
      "POST",
      `/collections/${encodeURIComponent(collection)}/points/query`,
      { vector, limit, filter });
  }

  deletePoints(collection: string,
               ids: Array<string | number>): Promise<{ deleted: number }> {
    return this.call(
      "POST",
      `/collections/${encodeURIComponent(collection)}/points/delete`,
      { ids });
  }

  getCollection(name: string): Promise<{ result: unknown }> {
    return this.call("GET",
                     `/collections/${encodeURIComponent(name)}`);
  }

  getPoints(collection: string, ids: Array<string | number>):
      Promise<{ points: Point[] }> {
    return this.call(
      "POST",
      `/collections/${encodeURIComponent(collection)}/points/get`,
      { ids });
  }

  scrollPoints(collection: string, limit = 100, offset?: string):
      Promise<{ points: Point[]; next_offset: string | null }> {
    return this.call(
      "POST",
      `/collections/${encodeURIComponent(collection)}/points/scroll`,
      { limit, offset });
  }
}
