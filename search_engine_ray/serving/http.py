"""Minimal HTTP serving surface (SURVEY.md §2.1 S8).

Mirrors the reference's FastAPI endpoints
(/root/reference/app/api/main.py:208-230) over stdlib ``http.server``
(FastAPI/uvicorn are not in this container; the handler and response shapes
are the contract, the transport is interchangeable):

  GET /search?q=...&limit=20&offset=0        -> {"results": [...], "count": n}
  GET /search/news?q=...&limit=20&offset=0   -> same, +8.0 intent bias
                                                (search_service.py:297)
  GET /spellcheck?q=...                      -> {"suggestion": str | null}

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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..state.query_engine import QueryEngine


def make_handler(engine, lexicon=None):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _json(self, code: int, payload: dict) -> None:
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
            limit = max(1, min(100, int((qs.get("limit") or ["20"])[0])))
            offset = max(0, int((qs.get("offset") or ["0"])[0]))
            with lock:
                rows = engine.search(q, limit=limit, offset=offset,
                                     intent_bias=intent_bias)
            results = [{"title": r["tool"] or "",
                        "description": r.get("text") or "",
                        "url": r["url"], "score": r["score"]} for r in rows]
            self._json(200, {"results": results,
                             "count": offset + len(results)})

        def do_GET(self):  # noqa: N802 (stdlib API)
            u = urlparse(self.path)
            qs = parse_qs(u.query)
            try:
                if u.path == "/search":
                    self._search(qs)
                elif u.path == "/search/news":
                    self._search(qs, intent_bias=8.0)
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
                 port: int = 0, lexicon=None, scoring: str = "reference"):
        engine = (index_dir_or_engine if hasattr(index_dir_or_engine,
                                                 "search")
                  else QueryEngine(index_dir_or_engine, scoring=scoring))
        self._httpd = ThreadingHTTPServer((host, port),
                                          make_handler(engine, lexicon))
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> "SearchServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "SearchServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.shutdown()
