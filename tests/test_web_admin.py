"""Web admin app (server/admin.py): every reference route
(neumann_server/src/web/mod.rs:86-166) served over the REST port —
relational/vector/graph browsers, search + path + algorithm forms,
metrics dashboard + JSON snapshot, achievements page, subgraph API."""

import json
import urllib.parse
import urllib.request

import pytest


@pytest.fixture(scope="module")
def srv():
    from neumann_tpu.server.rest import RestServer

    s = RestServer(port=0)
    port = s.serve()
    r = s.router
    r.execute("CREATE TABLE users (id INT PRIMARY KEY, name TEXT)")
    r.execute("INSERT INTO users VALUES (1, 'alice77')")
    r.execute("INSERT INTO users VALUES (2, 'bob88')")
    r.execute("EMBED STORE 'p1' [1.0, 0.0, 0.0]")
    r.execute("EMBED STORE 'p2' [0.0, 1.0, 0.0]")
    from neumann_tpu.engines.vector import VectorCollectionConfig

    r.vector.create_collection(
        "docs", VectorCollectionConfig(dimension=3))
    r.vector.store_in_collection("docs", "d1", [1.0, 0.0, 0.0],
                                 {"title": "one"})
    a = r.graph.create_node("Person", {"name": "alice77"})
    b = r.graph.create_node("Person", {"name": "bob88"})
    c = r.graph.create_node("City", {"name": "rome"})
    r.graph.create_edge(a, b, "KNOWS")
    r.graph.create_edge(b, c, "LIVES_IN")
    yield s, f"http://127.0.0.1:{port}", a, c
    s.stop()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as resp:
        return resp.status, resp.headers["Content-Type"], \
            resp.read().decode()


def _post_form(base, path, fields):
    data = urllib.parse.urlencode(fields).encode()
    req = urllib.request.Request(base + path, data=data, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, resp.read().decode()


def test_relational_browser(srv):
    _, base, _, _ = srv
    code, ctype, html = _get(base, "/relational")
    assert code == 200 and ctype.startswith("text/html")
    assert "users" in html
    _, _, html = _get(base, "/relational/users")
    assert "PRIMARY" in html.upper() or "pk" in html
    assert "id" in html and "name" in html
    _, _, html = _get(base, "/relational/users/rows?limit=1")
    assert "alice77" in html and "bob88" not in html
    _, _, html = _get(base, "/relational/users/rows?limit=1&offset=1")
    assert "bob88" in html


def test_vector_browser_and_search(srv):
    _, base, _, _ = srv
    _, _, html = _get(base, "/vector")
    assert "docs" in html and "_default" in html
    _, _, html = _get(base, "/vector/docs")
    assert "browse" in html
    _, _, html = _get(base, "/vector/docs/points")
    assert "d1" in html
    _, _, html = _get(base, "/vector/docs/points/d1")
    assert "title" in html and "one" in html and "dim" in html
    _, _, html = _get(base, "/vector/_default/points")
    assert "p1" in html and "p2" in html
    code, html = _post_form(base, "/vector/docs/search",
                            {"vector": "1.0, 0.0, 0.0", "limit": 5})
    assert code == 200 and "d1" in html
    code, html = _post_form(base, "/vector/_default/search",
                            {"vector": "0.0, 1.0, 0.0", "limit": 1})
    assert code == 200 and "p2" in html


def test_graph_browser_path_algorithms(srv):
    _, base, a, c = srv
    _, _, html = _get(base, "/graph")
    assert "Person" in html and "City" in html
    _, _, html = _get(base, "/graph/nodes?label=City")
    assert "rome" in html and "alice77" not in html
    _, _, html = _get(base, "/graph/edges")
    assert "KNOWS" in html and "LIVES_IN" in html
    code, html = _post_form(base, "/graph/path",
                            {"src": str(a), "dst": str(c)})
    assert code == 200 and "&rarr;" in html or "→" in html
    _, _, html = _get(base, "/graph/algorithms")
    assert "pagerank" in html
    code, html = _post_form(base, "/graph/algorithms",
                            {"algo": "pagerank"})
    assert code == 200 and "pagerank" in html and "0." in html
    code, html = _post_form(base, "/graph/algorithms",
                            {"algo": "drop_all"})
    assert "unknown algorithm" in html


def test_metrics_and_achievements_pages(srv):
    _, base, _, _ = srv
    _, _, html = _get(base, "/metrics/dashboard")
    assert "slow queries" in html
    code, ctype, body = _get(base, "/api/metrics")
    assert ctype.startswith("application/json")
    snap = json.loads(body)
    assert "statements" in snap and "slow_queries" in snap
    _, _, html = _get(base, "/achievements/page")
    assert "level" in html and "achievement" in html


def test_subgraph_api(srv):
    _, base, a, _ = srv
    _, ctype, body = _get(base, f"/api/graph/subgraph?center={a}"
                                "&depth=2")
    assert ctype.startswith("application/json")
    sub = json.loads(body)
    ids = {n["id"] for n in sub["nodes"]}
    assert a in ids and len(sub["edges"]) >= 2
    # no center: bounded default sample
    _, _, body = _get(base, "/api/graph/subgraph")
    assert json.loads(body)["nodes"]


def test_point_detail_missing(srv):
    _, base, _, _ = srv
    _, _, html = _get(base, "/vector/docs/points/nope")
    assert "not found" in html


def test_path_no_route(srv):
    _, base, _, _ = srv
    code, html = _post_form(base, "/graph/path",
                            {"src": "0", "dst": "999999"})
    assert "no path" in html or "err" in html
