/**
 * vitest suite for the REST client, driven against a mocked fetch that
 * records method/path/body — asserting the exact routes and payloads
 * server/rest.py serves (the Python conformance suite asserts the same
 * contract from the server side).
 */

import { describe, expect, it } from "vitest";

import { NeumannRestClient, NeumannRestError } from "./rest";

interface Call {
  url: string;
  method: string;
  body?: string;
}

function mockFetch(status: number, payload: unknown, calls: Call[]):
  typeof fetch {
  return (async (url: RequestInfo | URL, init?: RequestInit) => {
    calls.push({
      url: String(url),
      method: init?.method ?? "GET",
      body: init?.body === undefined ? undefined : String(init.body),
    });
    return {
      ok: status >= 200 && status < 300,
      status,
      statusText: "status",
      text: async () => JSON.stringify(payload),
    };
  }) as unknown as typeof fetch;
}

describe("NeumannRestClient", () => {
  it("POSTs /query with the statement", async () => {
    const calls: Call[] = [];
    const c = new NeumannRestClient(
      "http://h:8080/", mockFetch(200, { kind: "rows", rows: [] }, calls));
    const res = await c.query("SELECT 1");
    expect(res.kind).toBe("rows");
    expect(calls[0]).toMatchObject({
      url: "http://h:8080/query",
      method: "POST",
      body: JSON.stringify({ query: "SELECT 1" }),
    });
  });

  it("strips trailing slashes from the base url", async () => {
    const calls: Call[] = [];
    const c = new NeumannRestClient(
      "http://h:8080///", mockFetch(200, { ok: true }, calls));
    await c.health();
    expect(calls[0].url).toBe("http://h:8080/health");
  });

  it("covers the Qdrant-style collection routes", async () => {
    const calls: Call[] = [];
    const c = new NeumannRestClient(
      "http://h", mockFetch(200, { ok: true, result: [], points: [],
                                   next_offset: null }, calls));
    await c.createCollection("my col", { dimension: 4, metric: "cosine" });
    await c.upsertPoints("my col", [{ id: "a", vector: [1, 0] }]);
    await c.queryPoints("my col", [1, 0], 5,
                        { op: "eq", field: "k", value: 1 });
    await c.scrollPoints("my col", 10);
    await c.deletePoints("my col", ["a"]);
    await c.dropCollection("my col");
    expect(calls.map((x) => `${x.method} ${x.url}`)).toEqual([
      "PUT http://h/collections/my%20col",
      "PUT http://h/collections/my%20col/points",
      "POST http://h/collections/my%20col/points/query",
      "POST http://h/collections/my%20col/points/scroll",
      "POST http://h/collections/my%20col/points/delete",
      "DELETE http://h/collections/my%20col",
    ]);
    expect(JSON.parse(calls[2].body!)).toMatchObject({
      vector: [1, 0],
      limit: 5,
      filter: { op: "eq", field: "k", value: 1 },
    });
  });

  it("maps HTTP errors to NeumannRestError with the server message",
     async () => {
    const c = new NeumannRestClient(
      "http://h", mockFetch(400, { error: "unknown table 'x'" }, []));
    await expect(c.query("SELECT * FROM x")).rejects.toThrowError(
      NeumannRestError);
    await expect(c.query("SELECT * FROM x")).rejects.toThrow(
      "unknown table 'x'");
  });

  it("tolerates non-JSON error bodies", async () => {
    const raw = (async () => ({
      ok: false, status: 502, statusText: "Bad Gateway",
      text: async () => "<html>upstream exploded</html>",
    })) as unknown as typeof fetch;
    const c = new NeumannRestClient("http://h", raw);
    await expect(c.health()).rejects.toThrow("upstream exploded");
  });
});
