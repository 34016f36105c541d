// neumann_client.hpp — compiled (C++17) client SDK for neumann_tpu.
//
// Capability parity with the reference's compiled Rust client
// (neumann_client/src/lib.rs:286-843: builder, sync execute, batch,
// streaming, pagination, points/collections/blob services, API-key
// auth). Zero dependencies: hand-rolled protobuf encode/decode for the
// messages in neumann_tpu/server/neumann.proto, POSIX-socket
// HTTP/1.1, and grpc-web+proto framing (grpc/grpc-web PROTOCOL.md) —
// every call goes through the SAME generic gRPC handlers as native
// clients (auth, rate limiting, audit, metrics apply unchanged; see
// neumann_tpu/server/grpc_web.py). TLS is delegated to a terminating
// proxy (the image ships no TLS headers); the reference's embedded
// mode stays Python-side (server/client.py).
//
// Usage:
//   auto client = neumann::Client::Builder()
//       .host("127.0.0.1").port(8080).api_key("k1").connect();
//   auto res = client.execute("SELECT * FROM users");
//   for (auto& row : res.rows) std::cout << row << "\n";
//
// Thread safety: one Client per thread (each call opens a fresh
// connection; the server's HTTP facade is connection-per-request).

#pragma once

#include <netdb.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace neumann {

class Error : public std::runtime_error {
 public:
  Error(int code, const std::string& msg)
      : std::runtime_error(msg), code_(code) {}
  int code() const { return code_; }  // grpc-status, or -1 transport

 private:
  int code_;
};

// ---------------------------------------------------------------------------
// protobuf wire codec (proto3 subset: varint, 32/64-bit, length-delim)
// ---------------------------------------------------------------------------

namespace pb {

inline void put_varint(std::string& out, uint64_t v) {
  while (v >= 0x80) {
    out.push_back(static_cast<char>((v & 0x7F) | 0x80));
    v >>= 7;
  }
  out.push_back(static_cast<char>(v));
}

inline void put_tag(std::string& out, int field, int wire) {
  put_varint(out, static_cast<uint64_t>(field) << 3 | wire);
}

inline void put_string(std::string& out, int field, const std::string& s) {
  if (s.empty()) return;  // proto3 default
  put_tag(out, field, 2);
  put_varint(out, s.size());
  out += s;
}

inline void put_bytes_always(std::string& out, int field,
                             const std::string& s) {
  put_tag(out, field, 2);
  put_varint(out, s.size());
  out += s;
}

inline void put_int(std::string& out, int field, int64_t v) {
  if (v == 0) return;
  put_tag(out, field, 0);
  put_varint(out, static_cast<uint64_t>(v));
}

inline void put_float(std::string& out, int field, float v) {
  if (v == 0.0f) return;
  put_tag(out, field, 5);
  char buf[4];
  std::memcpy(buf, &v, 4);
  out.append(buf, 4);
}

inline void put_packed_floats(std::string& out, int field,
                              const std::vector<float>& vs) {
  if (vs.empty()) return;
  put_tag(out, field, 2);
  put_varint(out, vs.size() * 4);
  for (float v : vs) {
    char buf[4];
    std::memcpy(buf, &v, 4);
    out.append(buf, 4);
  }
}

inline void put_message(std::string& out, int field,
                        const std::string& body) {
  put_tag(out, field, 2);
  put_varint(out, body.size());
  out += body;
}

// Streaming reader over a byte view. get_* helpers skip unknown fields,
// so server-side message growth stays wire-compatible.
class Reader {
 public:
  Reader(const char* data, size_t len) : p_(data), end_(data + len) {}
  // Owns a copy: callers routinely pass temporaries
  // (`Reader(rd.bytes())`), which a view would dangle on.
  explicit Reader(std::string s) : own_(std::move(s)) {
    p_ = own_.data();
    end_ = p_ + own_.size();
  }

  bool next(int* field, int* wire) {
    if (p_ >= end_) return false;
    uint64_t key = varint();
    *field = static_cast<int>(key >> 3);
    *wire = static_cast<int>(key & 7);
    return true;
  }

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p_ < end_) {
      uint8_t b = static_cast<uint8_t>(*p_++);
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
      if (shift > 63) break;
    }
    throw Error(-1, "malformed varint");
  }

  std::string bytes() {
    uint64_t n = varint();
    if (p_ + n > end_) throw Error(-1, "truncated length-delimited field");
    std::string s(p_, p_ + n);
    p_ += n;
    return s;
  }

  float f32() {
    if (p_ + 4 > end_) throw Error(-1, "truncated fixed32");
    float v;
    std::memcpy(&v, p_, 4);
    p_ += 4;
    return v;
  }

  double f64() {
    if (p_ + 8 > end_) throw Error(-1, "truncated fixed64");
    double v;
    std::memcpy(&v, p_, 8);
    p_ += 8;
    return v;
  }

  void skip(int wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1: p_ += 8; break;
      case 2: bytes(); break;
      case 5: p_ += 4; break;
      default: throw Error(-1, "unsupported wire type");
    }
    if (p_ > end_) throw Error(-1, "truncated message");
  }

  // packed or unpacked repeated float
  void floats_into(int wire, std::vector<float>* out) {
    if (wire == 5) {
      out->push_back(f32());
      return;
    }
    std::string packed = bytes();
    for (size_t i = 0; i + 4 <= packed.size(); i += 4) {
      float v;
      std::memcpy(&v, packed.data() + i, 4);
      out->push_back(v);
    }
  }

 private:
  std::string own_;
  const char* p_;
  const char* end_;
};

}  // namespace pb

// ---------------------------------------------------------------------------
// message structs (neumann_tpu/server/neumann.proto)
// ---------------------------------------------------------------------------

struct Hit {
  std::string key;
  float score = 0.0f;
};

struct QueryResult {
  std::string kind;  // rows | similar | count | value | message
  std::string message;
  std::vector<std::string> rows;  // JSON-encoded row objects
  std::vector<Hit> hits;
  int64_t count = 0;
  std::string value_json;
  std::string error;

  static QueryResult parse(const std::string& body) {
    QueryResult r;
    pb::Reader rd(body);
    int f, w;
    while (rd.next(&f, &w)) {
      switch (f) {
        case 1: r.kind = rd.bytes(); break;
        case 2: r.message = rd.bytes(); break;
        case 3: {  // Row { string json = 1 }
          pb::Reader row(rd.bytes());
          int rf, rw;
          std::string json;
          while (row.next(&rf, &rw))
            if (rf == 1 && rw == 2) json = row.bytes();
            else row.skip(rw);
          r.rows.push_back(json);
          break;
        }
        case 4: {  // Hit { string key = 1; float score = 2 }
          pb::Reader hm(rd.bytes());
          Hit h;
          int hf, hw;
          while (hm.next(&hf, &hw))
            if (hf == 1 && hw == 2) h.key = hm.bytes();
            else if (hf == 2 && hw == 5) h.score = hm.f32();
            else hm.skip(hw);
          r.hits.push_back(h);
          break;
        }
        case 5: r.count = static_cast<int64_t>(rd.varint()); break;
        case 6: r.value_json = rd.bytes(); break;
        case 7: r.error = rd.bytes(); break;
        default: rd.skip(w);
      }
    }
    return r;
  }
};

struct Page {
  std::vector<std::string> rows;  // JSON-encoded
  std::string next_cursor;        // empty = exhausted
  std::string error;
};

struct Health {
  bool ok = false;
  std::string version;
  int64_t entries = 0;
  std::string device;
};

struct Point {
  std::string id;
  std::vector<float> vector;
  std::string payload_json;
};

struct ScoredPoint {
  std::string id;
  float score = 0.0f;
  std::string payload_json;
};

struct CollectionInfo {
  std::string name;
  int64_t count = 0;
  int32_t dimension = 0;
  std::string metric;
  std::string quantization;
};

struct ArtifactInfo {
  std::string id, name, checksum, content_type, creator, error;
  int64_t size = 0;
  double created = 0;
  int32_t chunks = 0;
  std::vector<std::string> tags, links;
};

// ---------------------------------------------------------------------------
// client
// ---------------------------------------------------------------------------

class Client {
 public:
  class Builder {
   public:
    Builder& host(const std::string& h) { host_ = h; return *this; }
    Builder& port(int p) { port_ = p; return *this; }
    Builder& api_key(const std::string& k) { api_key_ = k; return *this; }
    Builder& timeout_ms(int ms) { timeout_ms_ = ms; return *this; }
    Client connect() const {
      Client c(host_, port_, api_key_, timeout_ms_);
      c.health();  // fail fast like the Rust builder's connect()
      return c;
    }
    Client build() const {  // no connectivity probe
      return Client(host_, port_, api_key_, timeout_ms_);
    }

   private:
    std::string host_ = "127.0.0.1";
    int port_ = 8080;
    std::string api_key_;
    int timeout_ms_ = 30000;
  };

  // ---- QueryService ------------------------------------------------------

  QueryResult execute(const std::string& query) {
    std::string req;
    pb::put_string(req, 1, query);
    auto msgs = call("/neumann.QueryService/Execute", {req});
    QueryResult r = QueryResult::parse(first(msgs));
    if (!r.error.empty()) throw Error(-1, r.error);
    return r;
  }

  std::vector<QueryResult> execute_batch(
      const std::vector<std::string>& queries) {
    std::string req;
    for (const auto& q : queries) {
      std::string one;
      pb::put_string(one, 1, q);
      pb::put_message(req, 1, one);
    }
    auto msgs = call("/neumann.QueryService/ExecuteBatch", {req});
    pb::Reader rd(first(msgs));
    std::vector<QueryResult> out;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) out.push_back(QueryResult::parse(rd.bytes()));
      else rd.skip(w);
    }
    return out;
  }

  Page execute_paginated(const std::string& query, int page_size,
                         const std::string& cursor = "") {
    std::string req;
    pb::put_string(req, 1, query);
    pb::put_int(req, 2, page_size);
    pb::put_string(req, 3, cursor);
    auto msgs = call("/neumann.QueryService/ExecutePaginated", {req});
    pb::Reader rd(first(msgs));
    Page p;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) {
        pb::Reader row(rd.bytes());
        int rf, rw;
        std::string json;
        while (row.next(&rf, &rw))
          if (rf == 1 && rw == 2) json = row.bytes();
          else row.skip(rw);
        p.rows.push_back(json);
      } else if (f == 2 && w == 2) {
        p.next_cursor = rd.bytes();
      } else if (f == 3 && w == 2) {
        p.error = rd.bytes();
      } else {
        rd.skip(w);
      }
    }
    if (!p.error.empty()) throw Error(-1, p.error);
    return p;
  }

  bool close_cursor(const std::string& cursor) {
    std::string req;
    pb::put_string(req, 1, cursor);
    auto msgs = call("/neumann.QueryService/CloseCursor", {req});
    pb::Reader rd(first(msgs));
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 0) return rd.varint() != 0;
      rd.skip(w);
    }
    return false;
  }

  // Server-streaming Execute: grpc-web delivers the whole stream in one
  // HTTP response; each data frame is one QueryResponse chunk.
  std::vector<QueryResult> execute_stream(const std::string& query) {
    std::string req;
    pb::put_string(req, 1, query);
    auto msgs = call("/neumann.QueryService/ExecuteStream", {req});
    std::vector<QueryResult> out;
    out.reserve(msgs.size());
    for (const auto& m : msgs) out.push_back(QueryResult::parse(m));
    return out;
  }

  // ---- Health --------------------------------------------------------------

  Health health() {
    auto msgs = call("/neumann.Health/Check", {std::string()});
    pb::Reader rd(first(msgs));
    Health h;
    int f, w;
    while (rd.next(&f, &w)) {
      switch (f) {
        case 1: h.ok = rd.varint() != 0; break;
        case 2: h.version = rd.bytes(); break;
        case 3: h.entries = static_cast<int64_t>(rd.varint()); break;
        case 4: h.device = rd.bytes(); break;
        default: rd.skip(w);
      }
    }
    return h;
  }

  // ---- PointsService --------------------------------------------------------

  int64_t upsert_points(const std::string& collection,
                        const std::vector<Point>& points) {
    std::string req;
    pb::put_string(req, 1, collection);
    for (const auto& p : points) {
      std::string one;
      pb::put_string(one, 1, p.id);
      pb::put_packed_floats(one, 2, p.vector);
      pb::put_string(one, 3, p.payload_json);
      pb::put_message(req, 2, one);
    }
    auto msgs = call("/neumann.PointsService/Upsert", {req});
    pb::Reader rd(first(msgs));
    int64_t n = 0;
    std::string err;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 0) n = static_cast<int64_t>(rd.varint());
      else if (f == 2 && w == 2) err = rd.bytes();
      else rd.skip(w);
    }
    if (!err.empty()) throw Error(-1, err);
    return n;
  }

  std::vector<Point> get_points(const std::string& collection,
                                const std::vector<std::string>& ids) {
    std::string req;
    pb::put_string(req, 1, collection);
    for (const auto& id : ids) pb::put_string(req, 2, id);
    auto msgs = call("/neumann.PointsService/Get", {req});
    return parse_points(first(msgs), 1);
  }

  int64_t delete_points(const std::string& collection,
                        const std::vector<std::string>& ids) {
    std::string req;
    pb::put_string(req, 1, collection);
    for (const auto& id : ids) pb::put_string(req, 2, id);
    auto msgs = call("/neumann.PointsService/Delete", {req});
    pb::Reader rd(first(msgs));
    int64_t n = 0;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 0) n = static_cast<int64_t>(rd.varint());
      else rd.skip(w);
    }
    return n;
  }

  std::vector<ScoredPoint> query_points(const std::string& collection,
                                        const std::vector<float>& vector,
                                        int limit,
                                        const std::string& filter_json = "",
                                        bool with_payload = true,
                                        const std::string& metric = "") {
    auto msgs = call("/neumann.PointsService/Query",
                     {encode_query_points(collection, vector, limit,
                                          filter_json, with_payload,
                                          metric, 0)});
    return parse_scored_points(first(msgs));
  }

  // Qdrant query_batch parity: many queries in ONE RPC, answered in
  // order; a homogeneous batch runs as one batched device call
  // server-side (proto QueryPointsBatchRequest, repeated field 1)
  std::vector<std::vector<ScoredPoint>> query_points_batch(
      const std::string& collection,
      const std::vector<std::vector<float>>& vectors, int limit,
      const std::string& metric = "") {
    std::string batch;
    uint64_t rid = 1;
    for (const auto& v : vectors)
      pb::put_string(batch, 1,
                     encode_query_points(collection, v, limit, "",
                                         false, metric, rid++));
    auto msgs = call("/neumann.PointsService/QueryBatch", {batch});
    std::vector<std::vector<ScoredPoint>> out;
    pb::Reader rd(first(msgs));
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) out.push_back(parse_scored_points(rd.bytes()));
      else if (f == 2 && w == 2) throw Error(-1, rd.bytes());
      else rd.skip(w);
    }
    return out;
  }

  std::pair<std::vector<Point>, std::string> scroll_points(
      const std::string& collection, int limit,
      const std::string& offset_id = "") {
    std::string req;
    pb::put_string(req, 1, collection);
    pb::put_int(req, 2, limit);
    pb::put_string(req, 3, offset_id);
    auto msgs = call("/neumann.PointsService/Scroll", {req});
    const std::string& body = first(msgs);
    std::string next;
    pb::Reader rd(body);
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 2 && w == 2) next = rd.bytes();
      else rd.skip(w);
    }
    return {parse_points(body, 1, /*err_field=*/3), next};
  }

  // ---- CollectionsService ---------------------------------------------------

  void create_collection(const std::string& name, int dimension,
                         const std::string& metric = "cosine",
                         const std::string& quantization = "") {
    std::string req;
    pb::put_string(req, 1, name);
    pb::put_int(req, 2, dimension);
    pb::put_string(req, 3, metric);
    pb::put_string(req, 4, quantization);
    auto msgs = call("/neumann.CollectionsService/Create", {req});
    check_ok_error(first(msgs));
  }

  CollectionInfo get_collection(const std::string& name) {
    std::string req;
    pb::put_string(req, 1, name);
    auto msgs = call("/neumann.CollectionsService/Get", {req});
    pb::Reader rd(first(msgs));
    CollectionInfo info;
    std::string err;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) info = parse_collection(rd.bytes());
      else if (f == 2 && w == 2) err = rd.bytes();
      else rd.skip(w);
    }
    if (!err.empty()) throw Error(-1, err);
    return info;
  }

  void drop_collection(const std::string& name) {
    std::string req;
    pb::put_string(req, 1, name);
    auto msgs = call("/neumann.CollectionsService/Drop", {req});
    check_ok_error(first(msgs));
  }

  std::vector<CollectionInfo> list_collections() {
    auto msgs = call("/neumann.CollectionsService/List", {std::string()});
    pb::Reader rd(first(msgs));
    std::vector<CollectionInfo> out;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) out.push_back(parse_collection(rd.bytes()));
      else rd.skip(w);
    }
    return out;
  }

  // ---- BlobService -----------------------------------------------------------

  std::string upload_blob(const std::string& name, const std::string& data,
                          const std::string& content_type = "",
                          size_t chunk_size = 1 << 20) {
    // client-streaming: every chunk is its own grpc-web data frame
    std::vector<std::string> frames;
    size_t off = 0;
    bool firstc = true;
    do {
      std::string one;
      if (firstc) {
        pb::put_string(one, 1, name);
        pb::put_string(one, 2, content_type);
        firstc = false;
      }
      size_t n = std::min(chunk_size, data.size() - off);
      if (n || one.empty() || data.empty())
        pb::put_bytes_always(one, 3, data.substr(off, n));
      off += n;
      frames.push_back(one);
    } while (off < data.size());
    auto msgs = call("/neumann.BlobService/Upload", frames);
    pb::Reader rd(first(msgs));
    std::string id, err;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) id = rd.bytes();
      else if (f == 2 && w == 2) err = rd.bytes();
      else rd.skip(w);
    }
    if (!err.empty()) throw Error(-1, err);
    return id;
  }

  std::string download_blob(const std::string& artifact_id) {
    std::string req;
    pb::put_string(req, 1, artifact_id);
    auto msgs = call("/neumann.BlobService/Download", {req});
    std::string data;
    for (const auto& m : msgs) {
      pb::Reader rd(m);
      int f, w;
      while (rd.next(&f, &w)) {
        if (f == 3 && w == 2) data += rd.bytes();
        else rd.skip(w);
      }
    }
    return data;
  }

  void delete_blob(const std::string& artifact_id) {
    std::string req;
    pb::put_string(req, 1, artifact_id);
    auto msgs = call("/neumann.BlobService/Delete", {req});
    check_ok_error(first(msgs));
  }

  ArtifactInfo blob_metadata(const std::string& artifact_id) {
    std::string req;
    pb::put_string(req, 1, artifact_id);
    auto msgs = call("/neumann.BlobService/GetMetadata", {req});
    pb::Reader rd(first(msgs));
    ArtifactInfo a;
    int f, w;
    while (rd.next(&f, &w)) {
      switch (f) {
        case 1: a.id = rd.bytes(); break;
        case 2: a.name = rd.bytes(); break;
        case 3: a.size = static_cast<int64_t>(rd.varint()); break;
        case 4: a.checksum = rd.bytes(); break;
        case 5: a.content_type = rd.bytes(); break;
        case 6: a.creator = rd.bytes(); break;
        case 7: a.created = rd.f64(); break;
        case 8: a.tags.push_back(rd.bytes()); break;
        case 9: a.links.push_back(rd.bytes()); break;
        case 10: a.chunks = static_cast<int32_t>(rd.varint()); break;
        case 11: a.error = rd.bytes(); break;
        default: rd.skip(w);
      }
    }
    if (!a.error.empty()) throw Error(-1, a.error);
    return a;
  }

 private:
  Client(std::string host, int port, std::string api_key, int timeout_ms)
      : host_(std::move(host)), port_(port), api_key_(std::move(api_key)),
        timeout_ms_(timeout_ms) {}

  static const std::string& first(const std::vector<std::string>& msgs) {
    if (msgs.empty())
      throw Error(-1, "empty grpc-web response (no data frame)");
    return msgs.front();
  }

  static void check_ok_error(const std::string& body) {
    pb::Reader rd(body);
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 2 && w == 2) {
        std::string err = rd.bytes();
        if (!err.empty()) throw Error(-1, err);
      } else {
        rd.skip(w);
      }
    }
  }

  static std::string encode_query_points(const std::string& collection,
                                         const std::vector<float>& vector,
                                         int limit,
                                         const std::string& filter_json,
                                         bool with_payload,
                                         const std::string& metric,
                                         uint64_t req_id) {
    std::string req;
    pb::put_string(req, 1, collection);
    pb::put_packed_floats(req, 2, vector);
    pb::put_int(req, 3, limit);
    pb::put_string(req, 4, filter_json);
    if (with_payload) pb::put_int(req, 5, 1);
    pb::put_string(req, 6, metric);
    if (req_id) pb::put_int(req, 15, static_cast<int64_t>(req_id));
    return req;
  }

  static std::vector<ScoredPoint> parse_scored_points(
      const std::string& body) {
    pb::Reader rd(body);
    std::vector<ScoredPoint> out;
    std::string err;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == 1 && w == 2) {
        pb::Reader pm(rd.bytes());
        ScoredPoint sp;
        int pf, pw;
        while (pm.next(&pf, &pw)) {
          if (pf == 1 && pw == 2) sp.id = pm.bytes();
          else if (pf == 2 && pw == 5) sp.score = pm.f32();
          else if (pf == 3 && pw == 2) sp.payload_json = pm.bytes();
          else pm.skip(pw);
        }
        out.push_back(sp);
      } else if (f == 2 && w == 2) {
        err = rd.bytes();
      } else {
        rd.skip(w);
      }
    }
    if (!err.empty()) throw Error(-1, err);
    return out;
  }

  static std::vector<Point> parse_points(const std::string& body,
                                         int field, int err_field = 2) {
    pb::Reader rd(body);
    std::vector<Point> out;
    std::string err;
    int f, w;
    while (rd.next(&f, &w)) {
      if (f == field && w == 2) {
        pb::Reader pm(rd.bytes());
        Point p;
        int pf, pw;
        while (pm.next(&pf, &pw)) {
          if (pf == 1 && pw == 2) p.id = pm.bytes();
          else if (pf == 2) pm.floats_into(pw, &p.vector);
          else if (pf == 3 && pw == 2) p.payload_json = pm.bytes();
          else pm.skip(pw);
        }
        out.push_back(std::move(p));
      } else if (f == err_field && w == 2) {
        err = rd.bytes();
      } else {
        rd.skip(w);
      }
    }
    if (!err.empty()) throw Error(-1, err);
    return out;
  }

  static CollectionInfo parse_collection(const std::string& body) {
    pb::Reader rd(body);
    CollectionInfo c;
    int f, w;
    while (rd.next(&f, &w)) {
      switch (f) {
        case 1: c.name = rd.bytes(); break;
        case 2: c.count = static_cast<int64_t>(rd.varint()); break;
        case 3: c.dimension = static_cast<int32_t>(rd.varint()); break;
        case 4: c.metric = rd.bytes(); break;
        case 5: c.quantization = rd.bytes(); break;
        default: rd.skip(w);
      }
    }
    return c;
  }

  // ---- grpc-web transport ---------------------------------------------------

  // POST the request frames to `path`, return the response DATA frame
  // payloads; throws on transport failure or nonzero grpc-status.
  std::vector<std::string> call(const std::string& path,
                                const std::vector<std::string>& messages) {
    std::string body;
    for (const auto& m : messages) {
      body.push_back('\0');  // DATA flag
      uint32_t n = static_cast<uint32_t>(m.size());
      char len[4] = {static_cast<char>(n >> 24), static_cast<char>(n >> 16),
                     static_cast<char>(n >> 8), static_cast<char>(n)};
      body.append(len, 4);
      body += m;
    }
    std::string resp = http_post(path, body);
    // split frames; trailer frame (0x80) carries grpc-status
    std::vector<std::string> out;
    size_t off = 0;
    int status = 0;
    std::string status_msg;
    bool saw_trailer = false;
    while (off + 5 <= resp.size()) {
      uint8_t flag = static_cast<uint8_t>(resp[off]);
      uint32_t n = (static_cast<uint8_t>(resp[off + 1]) << 24) |
                   (static_cast<uint8_t>(resp[off + 2]) << 16) |
                   (static_cast<uint8_t>(resp[off + 3]) << 8) |
                   static_cast<uint8_t>(resp[off + 4]);
      off += 5;
      if (off + n > resp.size()) throw Error(-1, "truncated grpc-web frame");
      std::string payload = resp.substr(off, n);
      off += n;
      if (flag & 0x80) {
        saw_trailer = true;
        parse_trailers(payload, &status, &status_msg);
      } else {
        out.push_back(std::move(payload));
      }
    }
    if (!saw_trailer) throw Error(-1, "grpc-web response missing trailers");
    if (status != 0) throw Error(status, status_msg.empty()
                                             ? "grpc error " +
                                                   std::to_string(status)
                                             : status_msg);
    return out;
  }

  static void parse_trailers(const std::string& t, int* status,
                             std::string* msg) {
    size_t pos = 0;
    while (pos < t.size()) {
      size_t eol = t.find("\r\n", pos);
      std::string line =
          t.substr(pos, eol == std::string::npos ? eol : eol - pos);
      pos = eol == std::string::npos ? t.size() : eol + 2;
      size_t colon = line.find(':');
      if (colon == std::string::npos) continue;
      std::string key = line.substr(0, colon);
      std::string val = line.substr(colon + 1);
      while (!val.empty() && val.front() == ' ') val.erase(val.begin());
      if (key == "grpc-status") *status = std::atoi(val.c_str());
      if (key == "grpc-message") *msg = url_decode(val);
    }
  }

  static std::string url_decode(const std::string& s) {
    std::string out;
    for (size_t i = 0; i < s.size(); ++i) {
      if (s[i] == '%' && i + 2 < s.size()) {
        out.push_back(static_cast<char>(
            std::stoi(s.substr(i + 1, 2), nullptr, 16)));
        i += 2;
      } else {
        out.push_back(s[i]);
      }
    }
    return out;
  }

  // ---- HTTP/1.1 over a POSIX socket ------------------------------------------

  std::string http_post(const std::string& path, const std::string& body) {
    int fd = dial();
    std::string req = "POST " + path + " HTTP/1.1\r\n";
    req += "Host: " + host_ + ":" + std::to_string(port_) + "\r\n";
    req += "Content-Type: application/grpc-web+proto\r\n";
    if (!api_key_.empty()) req += "x-api-key: " + api_key_ + "\r\n";
    req += "Content-Length: " + std::to_string(body.size()) + "\r\n";
    req += "Connection: close\r\n\r\n";
    req += body;
    send_all(fd, req);
    std::string resp = recv_all(fd);
    ::close(fd);
    // split headers / body
    size_t hdr_end = resp.find("\r\n\r\n");
    if (hdr_end == std::string::npos)
      throw Error(-1, "malformed HTTP response");
    std::string headers = resp.substr(0, hdr_end);
    std::string payload = resp.substr(hdr_end + 4);
    int http_status = 0;
    if (headers.size() > 12)
      http_status = std::atoi(headers.c_str() + 9);
    if (http_status != 200)
      throw Error(-1, "HTTP " + std::to_string(http_status) + ": " +
                          payload.substr(0, 200));
    return payload;
  }

  int dial() {
    struct addrinfo hints {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo* res = nullptr;
    std::string port_s = std::to_string(port_);
    int rc = ::getaddrinfo(host_.c_str(), port_s.c_str(), &hints, &res);
    if (rc != 0 || !res)
      throw Error(-1, "resolve " + host_ + ": " + gai_strerror(rc));
    int fd = -1;
    for (auto* ai = res; ai; ai = ai->ai_next) {
      fd = ::socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
      if (fd < 0) continue;
      struct timeval tv {};
      tv.tv_sec = timeout_ms_ / 1000;
      tv.tv_usec = (timeout_ms_ % 1000) * 1000;
      ::setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
      ::setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
      if (::connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
      ::close(fd);
      fd = -1;
    }
    ::freeaddrinfo(res);
    if (fd < 0)
      throw Error(-1, "connect " + host_ + ":" + port_s + " failed");
    return fd;
  }

  static void send_all(int fd, const std::string& data) {
    size_t off = 0;
    while (off < data.size()) {
      ssize_t n = ::send(fd, data.data() + off, data.size() - off, 0);
      if (n <= 0) throw Error(-1, "send failed");
      off += static_cast<size_t>(n);
    }
  }

  static std::string recv_all(int fd) {
    std::string out;
    char buf[65536];
    for (;;) {
      ssize_t n = ::recv(fd, buf, sizeof(buf), 0);
      if (n < 0) throw Error(-1, "recv failed (timeout?)");
      if (n == 0) break;
      out.append(buf, static_cast<size_t>(n));
    }
    return out;
  }

  std::string host_;
  int port_;
  std::string api_key_;
  int timeout_ms_;
};

}  // namespace neumann
