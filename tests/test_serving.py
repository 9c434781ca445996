"""HTTP serving surface (S8): endpoints mirror the reference's FastAPI
response shapes (/root/reference/app/api/main.py:208-230,
app/api/search_service.py:122-141)."""

import json
import urllib.request

import pytest

from search_engine_ray.state.query_engine import QueryEngine


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read().decode())


@pytest.fixture(scope="module")
def server(built_index, tiny_transcripts):
    from search_engine_ray.serving.http import SearchServer
    from search_engine_ray.stages.spellcheck import (SpellcheckLexicon,
                                                     build_dictionary)
    import ray.data
    from search_engine_ray.stages.doc_ids import assign_doc_ids

    cfg, _ = built_index
    docs, _ = assign_doc_ids(ray.data.from_arrow(tiny_transcripts))
    lex = SpellcheckLexicon(build_dictionary(docs))
    with SearchServer(cfg.index_dir, lexicon=lex) as srv:
        yield srv, cfg


def test_search_endpoint_matches_engine(server):
    srv, cfg = server
    status, body = _get(srv.port, "/search?q=word0001%20word0002&limit=5")
    assert status == 200
    engine_rows, count = QueryEngine(cfg.index_dir).search_with_count(
        "word0001 word0002", limit=5)
    # reference count semantics: TOTAL ranked candidates, not page length
    # (search_service.py:342)
    assert body["count"] == count >= len(engine_rows)
    assert [r["url"] for r in body["results"]] == \
        [r["url"] for r in engine_rows]
    assert [r["score"] for r in body["results"]] == \
        [r["score"] for r in engine_rows]
    for item in body["results"]:
        assert set(item) == {"title", "description", "url", "score"}


def test_news_endpoint_bias(server):
    srv, _ = server
    _, plain = _get(srv.port, "/search?q=word0001&limit=3")
    _, news = _get(srv.port, "/search/news?q=word0001&limit=3")
    assert [r["url"] for r in news["results"]] == \
        [r["url"] for r in plain["results"]]
    for a, b in zip(news["results"], plain["results"]):
        assert a["score"] == pytest.approx(b["score"] + 8.0)


def test_paging_and_empty(server):
    srv, _ = server
    status, body = _get(srv.port, "/search?q=word0001&limit=5&offset=500")
    assert status == 200 and body["results"] == []
    # all-stopword query -> empty response (reference behavior)
    status, body = _get(srv.port, "/search?q=the%20and%20of")
    assert status == 200 and body["results"] == [] and body["count"] == 0
    # missing q -> 422 like FastAPI validation
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/search",
                               timeout=10)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 422
    assert raised


def test_spellcheck_endpoint(server):
    srv, _ = server
    status, body = _get(srv.port, "/spellcheck?q=word0001")
    assert status == 200 and body["suggestion"] is None


def test_root_html_page(server):
    srv, _ = server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/",
                                timeout=10) as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        assert b"<form" in r.read()


def test_mcp_tool_surface(server):
    """POST /mcp mirrors the reference MCP tools: same names, same markdown
    rendering ([url](title) + description), same limit bounding."""
    srv, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/mcp",
        data=json.dumps({"tool": "search_web", "query": "word0001",
                         "limit": 3}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        body = json.loads(r.read())
    _, plain = _get(srv.port, "/search?q=word0001&limit=3")
    expected = "\n\n".join(
        f"[{x['url']}]({x['title']})\n{x['description']}"
        for x in plain["results"]).strip()
    assert body["content"] == expected
    # unknown tool -> 422
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/mcp",
        data=json.dumps({"tool": "nope"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=10)
        ok = False
    except urllib.error.HTTPError as e:
        ok = e.code == 422
    assert ok
# time (needs the scratch_mcp.py handler changes applied first).


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        body = r.read().decode()
        return r.status, json.loads(body) if body else None


def test_mcp_jsonrpc_lifecycle(server):
    """Wire-level MCP: initialize -> initialized -> tools/list ->
    tools/call, all JSON-RPC 2.0 (public spec 2025-03-26, JSON response
    mode).  Tool results equal the legacy POST surface's markdown."""
    srv, _ = server
    st, init = _post(srv.port, "/mcp", {
        "jsonrpc": "2.0", "id": 1, "method": "initialize",
        "params": {"protocolVersion": "2025-03-26", "capabilities": {},
                   "clientInfo": {"name": "t", "version": "0"}}})
    assert st == 200 and init["jsonrpc"] == "2.0" and init["id"] == 1
    res = init["result"]
    assert res["serverInfo"] == {"name": "OpenGoogle", "version": "1"}
    assert "tools" in res["capabilities"]
    assert res["protocolVersion"] == "2025-03-26"

    st, none = _post(srv.port, "/mcp", {
        "jsonrpc": "2.0", "method": "notifications/initialized"})
    assert st == 202 and none is None

    _, lst = _post(srv.port, "/mcp",
                   {"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
    tools = {t["name"]: t for t in lst["result"]["tools"]}
    assert set(tools) == {"search_web", "search_news"}
    assert tools["search_web"]["description"] == \
        "Search websites and web documents."
    assert tools["search_web"]["inputSchema"]["required"] == ["query"]

    _, call = _post(srv.port, "/mcp", {
        "jsonrpc": "2.0", "id": 3, "method": "tools/call",
        "params": {"name": "search_web",
                   "arguments": {"query": "word0001 word0002", "limit": 3}}})
    content = call["result"]["content"]
    assert call["result"]["isError"] is False
    assert len(content) == 1 and content[0]["type"] == "text"
    _, legacy = _post(srv.port, "/mcp", {
        "tool": "search_web", "query": "word0001 word0002", "limit": 3})
    assert content[0]["text"] == legacy["content"]

    _, ping = _post(srv.port, "/mcp",
                    {"jsonrpc": "2.0", "id": 4, "method": "ping"})
    assert ping["result"] == {}


def test_mcp_jsonrpc_errors(server):
    srv, _ = server
    _, bad = _post(srv.port, "/mcp",
                   {"jsonrpc": "2.0", "id": 9, "method": "no/such"})
    assert bad["error"]["code"] == -32601
    _, badtool = _post(srv.port, "/mcp", {
        "jsonrpc": "2.0", "id": 10, "method": "tools/call",
        "params": {"name": "nope", "arguments": {}}})
    assert badtool["error"]["code"] == -32602
    _, notjson = _post(srv.port, "/mcp", {"jsonrpc": "1.0", "id": 11})
    assert notjson["error"]["code"] == -32600


def _raw_http(sock, data):
    """Send raw bytes, read ONE response (headers + Content-Length body).
    Returns (status_line, body_bytes)."""
    import socket as _socket
    sock.sendall(data)
    buf = b""
    while b"\r\n\r\n" not in buf:
        chunk = sock.recv(65536)
        if not chunk:
            return buf.split(b"\r\n")[0], b""
        buf += chunk
    head, _, rest = buf.partition(b"\r\n\r\n")
    cl = 0
    for line in head.split(b"\r\n"):
        if line.lower().startswith(b"content-length:"):
            cl = int(line.split(b":", 1)[1])
    while len(rest) < cl:
        chunk = sock.recv(65536)
        if not chunk:
            break
        rest += chunk
    return head.split(b"\r\n")[0], rest


def test_keepalive_reuse_and_body_drain(server):
    """HTTP/1.1 keep-alive: a POST with a body to a non-/mcp path (404)
    must drain the body so the NEXT request on the same connection parses
    cleanly, and two GETs reuse one socket."""
    import socket

    srv, _ = server
    body = json.dumps({"q": "x"}).encode()
    with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
        status, _ = _raw_http(
            s, b"POST /nope HTTP/1.1\r\nHost: h\r\n"
               b"Content-Type: application/json\r\n"
               b"Content-Length: " + str(len(body)).encode() +
               b"\r\n\r\n" + body)
        assert b" 404 " in status + b" "
        # same socket: must not see leftover body bytes as a request line
        status2, rest2 = _raw_http(
            s, b"GET /search?q=word0001&limit=1 HTTP/1.1\r\nHost: h\r\n\r\n")
        assert b" 200 " in status2 + b" "
        assert "results" in json.loads(rest2)


def test_mcp_parse_error_gets_response(server):
    """Malformed JSON must produce a JSON-RPC -32700 response, not a
    hung connection."""
    srv, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/mcp", data=b"{bad json",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        body = json.loads(r.read())
    assert body["error"]["code"] == -32700


def test_post_without_content_length_411(server):
    """No Content-Length on a keep-alive POST (e.g. chunked) -> 411 and
    the server closes the connection rather than desyncing it."""
    import socket

    srv, _ = server
    with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
        status, _ = _raw_http(s, b"POST /mcp HTTP/1.1\r\nHost: h\r\n\r\n")
        assert b" 411 " in status + b" "


def test_legacy_post_bad_limit_422(server):
    """Non-integer limit on the legacy POST path is a 422 client error
    (parity with the GET and JSON-RPC paths), not a 500."""
    srv, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/mcp",
        data=json.dumps({"tool": "search_web", "query": "x",
                         "limit": "abc"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=10)
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 422


def test_shutdown_quiesces_keepalive(built_index):
    """After shutdown(), a held-open keep-alive connection is refused
    (503 + close, or a plain close) instead of being served forever."""
    import socket

    from search_engine_ray.serving.http import SearchServer

    cfg, _ = built_index
    srv = SearchServer(cfg.index_dir).start()
    with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
        status, _ = _raw_http(
            s, b"GET /search?q=word0001 HTTP/1.1\r\nHost: h\r\n\r\n")
        assert b" 200 " in status + b" "
        srv.shutdown()
        try:
            s.sendall(b"GET /search?q=word0001 HTTP/1.1\r\nHost: h\r\n\r\n")
            status2, _ = _raw_http(s, b"")
        except OSError:
            status2 = b""
        assert status2 == b"" or b" 503 " in status2 + b" "


def test_search_count_and_param_validation(server):
    """count is the total ranked-candidate count (reference
    search_service.py:342), and out-of-range limit/offset get FastAPI's
    422 (Query(ge=1, le=100) / Query(ge=0)), not a clamp."""
    srv, cfg = server
    _, small = _get(srv.port, "/search?q=word0001&limit=1")
    _, big = _get(srv.port, "/search?q=word0001&limit=100")
    assert len(small["results"]) == 1
    # count = total ranked candidates at THIS page size (the candidate
    # limit scales with limit+offset, like the reference's stage-1 LIMIT),
    # so it exceeds the page length whenever more candidates matched
    eng = QueryEngine(cfg.index_dir)
    assert small["count"] == eng.search_with_count("word0001", limit=1)[1] \
        > len(small["results"])
    assert big["count"] == eng.search_with_count("word0001", limit=100)[1] \
        >= len(big["results"]) > 1
    for bad in ("limit=0", "limit=150", "offset=-1"):
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/search?q=x&{bad}", timeout=10)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 422, bad


def test_facets_endpoint(server):
    srv, cfg = server
    status, body = _get(srv.port, "/search/facets?q=word0001%20word0002")
    assert status == 200
    facets, count = QueryEngine(cfg.index_dir).facet_counts(
        "word0001 word0002")
    assert body == {"facets": facets, "count": count}
    assert set(body["facets"]) == {"role", "tool"}
    assert sum(body["facets"]["role"].values()) == count
    # termless query facets nothing; missing q is a validation error
    status, body = _get(srv.port, "/search/facets?q=the%20and%20of")
    assert status == 200 and body["count"] == 0 \
        and body["facets"] == {"role": {}, "tool": {}}
    try:
        _get(srv.port, "/search/facets?q=")
        raise AssertionError("expected 422")
    except urllib.error.HTTPError as e:
        assert e.code == 422


def test_near_endpoint(server):
    srv, cfg = server
    # build a phrase-engine-backed server on a tiny positional index
    import tempfile

    import pyarrow as pa
    import ray.data

    from search_engine_ray.serving.http import SearchServer
    from search_engine_ray.stages.positions import (build_positional_index,
                                                    pair_proximity)
    from search_engine_ray.state.phrase_engine import PhraseEngine

    class _NoEngine:
        def search(self, *a, **k):
            return []

        def search_with_count(self, *a, **k):
            return [], 0

    with tempfile.TemporaryDirectory() as idx:
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma", "alpha gamma beta alpha",
                              "beta delta"], pa.string()),
        }))
        build_positional_index(ds, idx, docs_per_bucket=2)
        exp = sorted(
            ((r["min_dist"], r["doc_id"]) for r in pair_proximity(
                idx, [("alpha", "beta")], max_dist=2).take_all()))
        with SearchServer(_NoEngine(), phrase_engine=PhraseEngine(idx)) as s:
            status, body = _get(s.port, "/search/near?a=alpha&b=beta&dist=2")
            assert status == 200
            assert [(r["min_dist"], r["doc_id"]) for r in body["results"]] \
                == exp
            assert body["count"] == len(exp)
            for bad in ("/search/near?a=alpha", "/search/near?a=a&b=b&dist=x",
                        "/search/near?a=a&b=b&limit=0"):
                try:
                    _get(s.port, bad)
                    raise AssertionError("expected 422")
                except urllib.error.HTTPError as e:
                    assert e.code == 422, bad
