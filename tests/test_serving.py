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
    engine_rows = QueryEngine(cfg.index_dir).search(
        "word0001 word0002", limit=5)
    assert body["count"] == len(engine_rows)
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
