// neumann_cli — example + conformance driver for the C++ client SDK.
//
// Modes:
//   neumann_cli <host> <port> exec "QUERY"       one statement, print JSON
//   neumann_cli <host> <port> conformance        run the wire battery the
//                                                pytest harness asserts on
//                                                (tests/test_cpp_client_
//                                                conformance.py), one JSON
//                                                line per step
//
// Mirrors the reference's client example surface
// (neumann_client/src/lib.rs:286-843).

#include <cstdio>
#include <string>

#include "neumann_client.hpp"

static std::string jesc(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\') { out.push_back('\\'); out.push_back(c); }
    else if (c == '\n') out += "\\n";
    else if (static_cast<unsigned char>(c) < 0x20) {
      char buf[8];
      std::snprintf(buf, sizeof(buf), "\\u%04x", c);
      out += buf;
    } else out.push_back(c);
  }
  return out;
}

static void print_result(const char* step, const neumann::QueryResult& r) {
  std::printf("{\"step\": \"%s\", \"kind\": \"%s\", \"rows\": %zu, "
              "\"hits\": %zu, \"count\": %lld, \"message\": \"%s\"}\n",
              step, jesc(r.kind).c_str(), r.rows.size(), r.hits.size(),
              static_cast<long long>(r.count), jesc(r.message).c_str());
}

static int conformance(neumann::Client& client) {
  // health
  auto h = client.health();
  std::printf("{\"step\": \"health\", \"ok\": %s, \"entries\": %lld}\n",
              h.ok ? "true" : "false", static_cast<long long>(h.entries));

  // relational round trip
  print_result("create", client.execute(
      "CREATE TABLE cpp_t (id INT, name TEXT)"));
  print_result("insert", client.execute(
      "INSERT INTO cpp_t VALUES (1, 'alpha')"));
  print_result("insert2", client.execute(
      "INSERT INTO cpp_t VALUES (2, 'beta')"));
  auto sel = client.execute("SELECT * FROM cpp_t");
  print_result("select", sel);
  std::printf("{\"step\": \"select_row0\", \"json\": \"%s\"}\n",
              jesc(sel.rows.empty() ? "" : sel.rows[0]).c_str());

  // batch
  auto batch = client.execute_batch(
      {"INSERT INTO cpp_t VALUES (3, 'gamma')", "SELECT * FROM cpp_t"});
  std::printf("{\"step\": \"batch\", \"n\": %zu, \"rows_last\": %zu}\n",
              batch.size(),
              batch.empty() ? 0 : batch.back().rows.size());

  // pagination (2 rows/page over 3 rows -> 2 pages)
  auto p1 = client.execute_paginated("SELECT * FROM cpp_t", 2);
  auto p2 = p1.next_cursor.empty()
                ? neumann::Page{}
                : client.execute_paginated("SELECT * FROM cpp_t", 2,
                                           p1.next_cursor);
  std::printf("{\"step\": \"paginate\", \"p1\": %zu, \"p2\": %zu, "
              "\"exhausted\": %s}\n",
              p1.rows.size(), p2.rows.size(),
              p2.next_cursor.empty() ? "true" : "false");
  if (!p2.next_cursor.empty()) client.close_cursor(p2.next_cursor);

  // vector path: embed + SIMILAR through the query language
  print_result("embed", client.execute(
      "EMBED STORE 'cpp_v1' [1.0, 0.0, 0.0, 0.0]"));
  print_result("embed2", client.execute(
      "EMBED STORE 'cpp_v2' [0.0, 1.0, 0.0, 0.0]"));
  auto sim = client.execute("SIMILAR [1.0, 0.0, 0.0, 0.0] TOP 2");
  print_result("similar", sim);
  std::printf("{\"step\": \"similar_top\", \"key\": \"%s\"}\n",
              jesc(sim.hits.empty() ? "" : sim.hits[0].key).c_str());

  // streaming (buffered server-stream over grpc-web)
  auto chunks = client.execute_stream("SELECT * FROM cpp_t");
  size_t srows = 0;
  for (auto& c : chunks) srows += c.rows.size();
  std::printf("{\"step\": \"stream\", \"chunks\": %zu, \"rows\": %zu}\n",
              chunks.size(), srows);

  // points + collections (Qdrant-style services)
  client.create_collection("cpp_col", 4, "cosine");
  auto cols = client.list_collections();
  std::printf("{\"step\": \"collections\", \"n\": %zu}\n", cols.size());
  auto info = client.get_collection("cpp_col");
  std::printf("{\"step\": \"collection_info\", \"name\": \"%s\", "
              "\"dimension\": %d}\n",
              jesc(info.name).c_str(), info.dimension);
  int64_t up = client.upsert_points(
      "cpp_col",
      {{"p1", {1.f, 0.f, 0.f, 0.f}, "{\"tag\": \"a\"}"},
       {"p2", {0.f, 1.f, 0.f, 0.f}, "{\"tag\": \"b\"}"}});
  std::printf("{\"step\": \"upsert\", \"n\": %lld}\n",
              static_cast<long long>(up));
  auto got = client.get_points("cpp_col", {"p1"});
  std::printf("{\"step\": \"get_points\", \"n\": %zu, \"dim\": %zu}\n",
              got.size(), got.empty() ? 0 : got[0].vector.size());
  auto qp = client.query_points("cpp_col", {1.f, 0.f, 0.f, 0.f}, 2);
  std::printf("{\"step\": \"query_points\", \"n\": %zu, \"top\": \"%s\"}\n",
              qp.size(), jesc(qp.empty() ? "" : qp[0].id).c_str());
  auto qb = client.query_points_batch(
      "cpp_col", {{1.f, 0.f, 0.f, 0.f}, {0.f, 1.f, 0.f, 0.f}}, 1);
  std::printf("{\"step\": \"query_batch\", \"n\": %zu, "
              "\"t0\": \"%s\", \"t1\": \"%s\"}\n",
              qb.size(),
              jesc(qb.size() > 0 && !qb[0].empty() ? qb[0][0].id : "")
                  .c_str(),
              jesc(qb.size() > 1 && !qb[1].empty() ? qb[1][0].id : "")
                  .c_str());
  auto scroll = client.scroll_points("cpp_col", 1);
  std::printf("{\"step\": \"scroll\", \"n\": %zu, \"has_next\": %s}\n",
              scroll.first.size(),
              scroll.second.empty() ? "false" : "true");
  int64_t del = client.delete_points("cpp_col", {"p2"});
  std::printf("{\"step\": \"delete_points\", \"n\": %lld}\n",
              static_cast<long long>(del));

  // blobs (client-streaming upload, server-streaming download)
  std::string blob(3 << 20, 'x');
  for (size_t i = 0; i < blob.size(); ++i)
    blob[i] = static_cast<char>('a' + (i * 131) % 26);
  std::string bid = client.upload_blob("cpp.bin", blob,
                                       "application/octet-stream");
  auto meta = client.blob_metadata(bid);
  std::string back = client.download_blob(bid);
  std::printf("{\"step\": \"blob\", \"size\": %lld, \"roundtrip\": %s, "
              "\"chunks\": %d}\n",
              static_cast<long long>(meta.size),
              back == blob ? "true" : "false", meta.chunks);
  client.delete_blob(bid);

  // error propagation: bad statement must raise with the server message
  bool raised = false;
  std::string errmsg;
  try {
    client.execute("DEFINITELY NOT A QUERY !!");
  } catch (const neumann::Error& e) {
    raised = true;
    errmsg = e.what();
  }
  std::printf("{\"step\": \"error\", \"raised\": %s, \"msg\": \"%s\"}\n",
              raised ? "true" : "false",
              jesc(errmsg.substr(0, 60)).c_str());

  std::printf("{\"step\": \"done\"}\n");
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <host> <port> exec \"QUERY\" | conformance "
                 "[api_key]\n",
                 argv[0]);
    return 2;
  }
  try {
    auto b = neumann::Client::Builder().host(argv[1]).port(
        std::atoi(argv[2]));
    std::string mode = argv[3];
    if (mode == "conformance" && argc > 4) b.api_key(argv[4]);
    auto client = b.build();
    if (mode == "exec") {
      if (argc < 5) { std::fprintf(stderr, "exec needs a query\n"); return 2; }
      print_result("exec", client.execute(argv[4]));
      return 0;
    }
    if (mode == "conformance") return conformance(client);
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "fatal: %s\n", e.what());
    std::printf("{\"step\": \"fatal\", \"error\": \"%s\"}\n",
                jesc(e.what()).c_str());
    return 1;
  }
}
