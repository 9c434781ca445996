"""Minimal HTTP serving surface (SURVEY.md §2.1 S8).

Mirrors the reference's FastAPI endpoints
(/root/reference/app/api/main.py:208-230) over stdlib ``http.server``
(FastAPI/uvicorn are not in this container; the handler and response shapes
are the contract, the transport is interchangeable):

  GET /                                      -> minimal search HTML page
                                                (main.py:203-205 FileResponse)
  GET /search?q=...&limit=20&offset=0        -> {"results": [...], "count": n}
  GET /search/news?q=...&limit=20&offset=0   -> same, +8.0 intent bias
                                                (search_service.py:297)
  GET /spellcheck?q=...                      -> {"suggestion": str | null}
  POST /mcp — TWO accepted bodies:
    * {"jsonrpc": "2.0", ...} -> wire-compatible MCP JSON-RPC 2.0 (public
      spec 2025-03-26, JSON response mode of the Streamable HTTP
      transport — no SSE): initialize, notifications/* (202 empty), ping,
      tools/list, tools/call; JSON-RPC errors -32700/-32600/-32601/-32602.
    * legacy {"tool": "search_web"|"search_news", "query", "limit",
      "offset"} -> {"content": "<markdown result list>"} — kept for simple
      clients.
    Both mirror the reference's MCP tool surface
    (/root/reference/app/mcp/server.py:31-64: same tool names and
    descriptions, same [url](title)\\ndescription markdown rendering, same
    limit/offset bounding and per-tool defaults).

Each result item is {"title", "description", "url", "score"}
(search_service.py:122-127 WebSearchItem): title := tool, description :=
text, url := conv_id#turn_idx — the transcript field mapping pinned in
state/query_engine.py.

The server holds ONE warm engine (QueryEngine or ShardedQueryEngine) for its
lifetime — load-once-serve-many, the reference's service shape.  Threaded so
concurrent requests interleave (engine reads are thread-safe apart from the
accumulate buffers, which are guarded by a lock).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..state.query_engine import QueryEngine

_SEARCH_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>search_engine_ray</title></head>
<body><h1>search_engine_ray</h1>
<form action="/search" method="get">
  <input name="q" type="text" autofocus>
  <button type="submit">Search</button>
</form></body></html>
"""


_MCP_PROTOCOL_VERSION = "2025-03-26"
_MCP_SERVER_INFO = {"name": "OpenGoogle", "version": "1"}
_MCP_INSTRUCTIONS = (
    "Use search_web for general web pages and search_news for news content. "
    "Set limit and offset for pagination.")

_MCP_TOOLS = [
    {
        "name": "search_web",
        "description": "Search websites and web documents.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "limit": {"type": "integer", "default": 10},
                "offset": {"type": "integer", "default": 0},
            },
            "required": ["query"],
        },
    },
    {
        "name": "search_news",
        "description": "Search news articles.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "limit": {"type": "integer", "default": 20},
                "offset": {"type": "integer", "default": 0},
            },
            "required": ["query"],
        },
    },
]


def _bounded(limit: int, offset: int) -> tuple[int, int]:
    """(/root/reference/app/mcp/server.py:27-28)"""
    return max(1, min(limit, 100)), max(0, offset)


def _mcp_markdown(results: list[dict]) -> str:
    """[url](title)\\ndescription blocks (app/mcp/server.py:37-46)."""
    out = ""
    for r in results:
        out += f"[{r['url']}]({r['title']})\n{r['description']}\n\n"
    return out.strip()


_TRACK_INIT = threading.Lock()


def _ensure_tracking(srv):
    """Idempotently attach the in-flight request counter to any server the
    handler runs under (SearchServer sets it up front; a bare
    ThreadingHTTPServer + make_handler gets it lazily here)."""
    if not hasattr(srv, "inflight_lock"):
        with _TRACK_INIT:
            if not hasattr(srv, "inflight_lock"):
                srv.inflight = 0
                srv.inflight_lock = threading.Lock()
    return srv


def make_handler(engine, lexicon=None, *,
                 serialize_search: bool | None = None,
                 phrase_engine=None):
    """``serialize_search``: guard engine.search with a lock.  Default: only
    for a single-process QueryEngine (its stage-1 accumulate buffers are
    reused per engine).  A ShardedQueryEngine needs no lock — per-shard
    state lives in actors (which serialize per actor), and the driver-side
    merge is pure-local, so concurrent requests pipeline across shards."""
    import contextlib
    if serialize_search is None:
        serialize_search = isinstance(engine, QueryEngine)
    lock = threading.Lock() if serialize_search else contextlib.nullcontext()

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 => persistent connections (every response carries
        # Content-Length); under HTTP/1.0 each request paid a fresh TCP
        # setup on the QPS-benchmarked surface
        protocol_version = "HTTP/1.1"
        # bound idle keep-alive reads: handle_one_request treats a socket
        # timeout as close_connection, so parked handler threads exit
        # within this window after SearchServer.shutdown()
        timeout = 30

        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _refuse_if_shutting_down(self) -> bool:
            """503 + Connection: close once shutdown() has begun — without
            this, keep-alive clients holding an open connection would be
            served indefinitely after shutdown() returns."""
            if getattr(self.server, "shutting_down", False):
                self.close_connection = True
                self._json(503, {"detail": "server shutting down"})
                return True
            return False

        def _json(self, code: int, payload: dict | list) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _search(self, qs: dict, *, intent_bias: float = 0.0) -> None:
            q = (qs.get("q") or [""])[0]
            if not q:
                self._json(422, {"detail": "q required"})
                return
            try:
                limit = int((qs.get("limit") or ["20"])[0])
                offset = int((qs.get("offset") or ["0"])[0])
            except ValueError:
                # FastAPI rejects unparsable query params with 422, not 500
                self._json(422, {"detail": "limit/offset must be integers"})
                return
            if not 1 <= limit <= 100 or offset < 0:
                # the HTTP endpoints VALIDATE (Query(ge=1, le=100) /
                # Query(ge=0), main.py:210-212) — only the MCP tool paths
                # clamp via _bounded (mcp/server.py:27-28)
                self._json(422, {"detail": "limit must be 1..100, "
                                           "offset >= 0"})
                return
            results, count = self._search_page(q, limit, offset,
                                               intent_bias)
            self._json(200, {"results": results, "count": count})

        def _search_page(self, q: str, limit: int, offset: int,
                         intent_bias: float = 0.0
                         ) -> tuple[list[dict], int]:
            """(rows, count) — count is the reference's total
            ranked-candidate count (max(len(ranked), offset + len(page)),
            0 for termless queries; search_service.py:338-342), NOT the
            page length."""
            with lock:
                rows, count = engine.search_with_count(
                    q, limit=limit, offset=offset, intent_bias=intent_bias)
            return ([{"title": r["tool"] or "",
                      "description": r.get("text") or "",
                      "url": r["url"], "score": r["score"]} for r in rows],
                    count)

        def _search_rows(self, q: str, limit: int, offset: int,
                         intent_bias: float = 0.0) -> list[dict]:
            return self._search_page(q, limit, offset, intent_bias)[0]

        @staticmethod
        def _rpc_result(rid, result: dict) -> dict:
            return {"jsonrpc": "2.0", "id": rid, "result": result}

        @staticmethod
        def _rpc_error(rid, code: int, message: str) -> dict:
            return {"jsonrpc": "2.0", "id": rid,
                    "error": {"code": code, "message": message}}

        def _mcp_response(self, req) -> dict | None:
            """One MCP JSON-RPC 2.0 response object (public spec
            2025-03-26); None for notifications (no response due)."""
            if not isinstance(req, dict):
                return self._rpc_error(None, -32600, "invalid request")
            rid = req.get("id")
            method = req.get("method")
            params = req.get("params") or {}
            if (req.get("jsonrpc") != "2.0" or not isinstance(method, str)
                    or not isinstance(params, dict)):
                return self._rpc_error(rid, -32600, "invalid request")
            if method.startswith("notifications/"):
                return None
            if method == "initialize":
                return self._rpc_result(rid, {
                    "protocolVersion": _MCP_PROTOCOL_VERSION,
                    "capabilities": {"tools": {"listChanged": False}},
                    "serverInfo": _MCP_SERVER_INFO,
                    "instructions": _MCP_INSTRUCTIONS,
                })
            if method == "ping":
                return self._rpc_result(rid, {})
            if method == "tools/list":
                return self._rpc_result(rid, {"tools": _MCP_TOOLS})
            if method == "tools/call":
                name = params.get("name")
                args = params.get("arguments") or {}
                if name not in ("search_web", "search_news"):
                    return self._rpc_error(rid, -32602,
                                           f"unknown tool {name!r}")
                if not isinstance(args, dict):
                    return self._rpc_error(rid, -32602,
                                           "arguments must be an object")
                query = args.get("query")
                if not isinstance(query, str):
                    # the tool's inputSchema declares query required — a
                    # missing/mistyped arg is a client error, not a search
                    # for the empty string
                    return self._rpc_error(rid, -32602, "query required")
                try:
                    limit, offset = self._limit_offset(
                        name, args.get("limit"), args.get("offset"))
                except (TypeError, ValueError):
                    return self._rpc_error(rid, -32602,
                                           "limit/offset must be integers")
                bias = 8.0 if name == "search_news" else 0.0
                rows = self._search_rows(query, limit, offset, bias)
                return self._rpc_result(rid, {
                    "content": [{"type": "text",
                                 "text": _mcp_markdown(rows)}],
                    "isError": False,
                })
            return self._rpc_error(rid, -32601,
                                   f"method not found: {method}")

        def _accepted(self) -> None:
            self.send_response(202)
            self.send_header("Content-Length", "0")
            self.end_headers()

        @staticmethod
        def _limit_offset(tool: str, raw_limit, raw_offset) -> tuple[int,
                                                                     int]:
            """Shared limit/offset parsing for the JSON-RPC and legacy
            POST paths.  A client's limit=0 is a value (clamped to 1 by
            _bounded), not "absent" — only None takes the per-tool
            default.  Raises TypeError/ValueError on unparsable input."""
            if raw_limit is None:
                raw_limit = 10 if tool == "search_web" else 20
            return _bounded(int(raw_limit), int(raw_offset or 0))

        def do_POST(self):  # noqa: N802 (stdlib API)
            self._tracked(self._handle_post)

        def do_GET(self):  # noqa: N802 (stdlib API)
            self._tracked(self._handle_get)

        def _tracked(self, inner) -> None:
            """Count in-flight requests on the server object so
            shutdown() can drain: a request already past the
            _refuse_if_shutting_down check keeps running after the accept
            loop stops, and callers commonly tear down the engine (e.g.
            kill shard actors) as soon as shutdown() returns."""
            srv = _ensure_tracking(self.server)
            with srv.inflight_lock:
                srv.inflight += 1
            try:
                inner()
            finally:
                with srv.inflight_lock:
                    srv.inflight -= 1

        def _handle_post(self):
            if self._refuse_if_shutting_down():
                return
            u = urlparse(self.path)
            try:
                cl = self.headers.get("Content-Length")
                if cl is None:
                    # keep-alive: an unread (e.g. chunked) body would
                    # desync the connection — require a length and close
                    self.close_connection = True
                    self._json(411, {"detail": "Content-Length required"})
                    return
                try:
                    length = int(cl)
                    if length < 0:
                        raise ValueError(cl)
                except ValueError:
                    self.close_connection = True
                    self._json(400, {"detail": "invalid Content-Length"})
                    return
                # drain the body BEFORE any early return — leftover bytes
                # would be parsed as the next request line on this
                # persistent connection
                body = self.rfile.read(length)
                if u.path != "/mcp":
                    self._json(404, {"detail": "not found"})
                    return
                try:
                    req = json.loads(body or b"{}")
                except json.JSONDecodeError:
                    self._json(200, self._rpc_error(None, -32700,
                                                    "parse error"))
                    return
                if isinstance(req, list):
                    # JSON-RPC batch (2025-03-26 transport): respond with
                    # the non-notification responses, 202 if none are due
                    if not req:
                        self._json(200, self._rpc_error(
                            None, -32600, "invalid request"))
                        return
                    resps = [r for r in map(self._mcp_response, req)
                             if r is not None]
                    if resps:
                        self._json(200, resps)
                    else:
                        self._accepted()
                    return
                if isinstance(req, dict) and "jsonrpc" in req:
                    resp = self._mcp_response(req)
                    if resp is None:
                        self._accepted()
                    else:
                        self._json(200, resp)
                    return
                if not isinstance(req, dict):
                    self._json(422, {"detail": "invalid request body"})
                    return
                tool = req.get("tool")
                if tool not in ("search_web", "search_news"):
                    self._json(422, {"detail": f"unknown tool {tool!r}"})
                    return
                try:
                    limit, offset = self._limit_offset(
                        tool, req.get("limit"), req.get("offset"))
                except (TypeError, ValueError):
                    self._json(422,
                               {"detail": "limit/offset must be integers"})
                    return
                bias = 8.0 if tool == "search_news" else 0.0
                rows = self._search_rows(str(req.get("query") or ""), limit,
                                         offset, bias)
                self._json(200, {"content": _mcp_markdown(rows)})
            except Exception as e:  # pragma: no cover - defensive 500
                self._json(500, {"detail": str(e)})

        def _handle_get(self):
            if self._refuse_if_shutting_down():
                return
            u = urlparse(self.path)
            qs = parse_qs(u.query)
            try:
                if u.path == "/":
                    body = _SEARCH_HTML.encode("utf-8")
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/search":
                    self._search(qs)
                elif u.path == "/search/news":
                    self._search(qs, intent_bias=8.0)
                elif u.path == "/search/phrase":
                    if phrase_engine is None:
                        self._json(404, {"detail": "no positional index"})
                        return
                    q = (qs.get("q") or [""])[0]
                    if not q.strip():
                        self._json(422, {"detail": "q required"})
                        return
                    try:
                        limit = int((qs.get("limit") or ["10"])[0])
                    except ValueError:
                        self._json(422, {"detail": "bad limit"})
                        return
                    if not 1 <= limit <= 100:
                        self._json(422, {"detail": "bad limit"})
                        return
                    hits = phrase_engine.phrase(q, limit=limit)
                    self._json(200, {"results": hits, "count": len(hits)})
                elif u.path == "/search/near":
                    if phrase_engine is None:
                        self._json(404, {"detail": "no positional index"})
                        return
                    a = (qs.get("a") or [""])[0]
                    b = (qs.get("b") or [""])[0]
                    if not a.strip() or not b.strip():
                        self._json(422, {"detail": "a and b required"})
                        return
                    try:
                        dist = int((qs.get("dist") or ["4"])[0])
                        limit = int((qs.get("limit") or ["10"])[0])
                    except ValueError:
                        self._json(422, {"detail": "bad dist/limit"})
                        return
                    if not 0 <= dist <= 1000 or not 1 <= limit <= 100:
                        self._json(422, {"detail": "bad dist/limit"})
                        return
                    hits = phrase_engine.near(a, b, max_dist=dist,
                                              limit=limit)
                    self._json(200, {"results": hits, "count": len(hits)})
                elif u.path == "/search/facets":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        self._json(422, {"detail": "q required"})
                        return
                    if not hasattr(engine, "facet_counts"):
                        self._json(404, {"detail": "facets unsupported"})
                        return
                    try:
                        with lock:
                            facets, count = engine.facet_counts(q)
                    except RuntimeError:
                        # built load_docs=False: facet_counts raises
                        # RuntimeError (documented); other exceptions
                        # surface as 500 rather than masking bugs as 404
                        self._json(404, {"detail": "facets unsupported"})
                        return
                    self._json(200, {"facets": facets, "count": count})
                elif u.path == "/spellcheck":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        self._json(422, {"detail": "q required"})
                        return
                    # reference returns null when nothing changed
                    # (app/api/main.py:193-195)
                    sug = (lexicon.correct_text(q)
                           if lexicon is not None else None)
                    if sug == q:
                        sug = None
                    self._json(200, {"suggestion": sug})
                else:
                    self._json(404, {"detail": "not found"})
            except Exception as e:  # pragma: no cover - defensive 500
                self._json(500, {"detail": str(e)})

    return Handler


class SearchServer:
    """Owns a ThreadingHTTPServer bound to (host, port); ``port=0`` picks a
    free port (exposed as ``.port``).  start()/shutdown() or context
    manager."""

    def __init__(self, index_dir_or_engine, *, host: str = "127.0.0.1",
                 port: int = 0, lexicon=None, scoring: str = "reference",
                 phrase_engine=None):
        engine = (index_dir_or_engine if hasattr(index_dir_or_engine,
                                                 "search")
                  else QueryEngine(index_dir_or_engine, scoring=scoring))
        self._httpd = ThreadingHTTPServer(
            (host, port),
            make_handler(engine, lexicon, phrase_engine=phrase_engine))
        self._httpd.inflight = 0
        self._httpd.inflight_lock = threading.Lock()
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> "SearchServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        # flag first: handler threads parked on open keep-alive
        # connections 503-and-close on their next request (idle ones exit
        # via the handler's socket timeout) — httpd.shutdown() alone only
        # stops the accept loop
        self._httpd.shutting_down = True
        self._httpd.shutdown()
        # drain in-flight handlers (bounded): requests already past the
        # refuse check may still be executing against the engine — callers
        # that kill engine actors right after shutdown() would 500 them
        deadline = time.time() + 2.0
        while time.time() < deadline:
            with self._httpd.inflight_lock:
                if self._httpd.inflight == 0:
                    break
            time.sleep(0.01)
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "SearchServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.shutdown()
