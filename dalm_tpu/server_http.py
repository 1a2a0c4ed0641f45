"""HTTP serving front-end for :class:`dalm_tpu.serve.RagPipeline`.

Stdlib-only (``http.server``): no web-framework dependency, so the
serving stack is deployable anywhere the package runs. The reference has
no serving surface at all (SURVEY §3.4); this exposes the TPU pipeline —
retrieval, continuous-batching decode, per-token streaming — over plain
HTTP:

- ``GET  /healthz``          → ``{"status": "ok", "passages": N}``
- ``POST /answer``           body ``{"query": ..., "top_k"?: k,
  "budget"?: n}`` → ``{"answer", "passages", "scores"}``
- ``POST /stream``           same body → ``text/plain`` CHUNKED response
  whose chunks are answer text decoded incrementally (tokens flush as
  the scheduler produces them; requests share the slot pool and join
  mid-flight — `models/streaming.py`).

Concurrency: ``ThreadingHTTPServer`` gives each request a thread; all of
them submit into ONE streaming session whose scheduler thread owns the
decode engine, so concurrent requests batch onto the device rather than
queueing behind each other.

Start programmatically (:func:`serve_pipeline`) or via the CLI::

    dalm serve out/retriever out/generator --passages corpus.txt --port 8080
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

logger = logging.getLogger(__name__)


class RagHTTPServer:
    """Wraps a RagPipeline + streaming session behind an HTTP server."""

    def __init__(self, pipe, host: str = "127.0.0.1", port: int = 8080, num_slots: int = 32,
                 decode_chunk: int = 8):
        self.pipe = pipe
        self.session = pipe.stream(num_slots=num_slots, decode_chunk=decode_chunk)
        self.session.__enter__()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # chunked transfer framing requires HTTP/1.1 (the 1.0 default
            # would make strict clients read raw chunk markers)
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # route through logging, not stderr
                logger.debug("http: " + fmt, *args)

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _read_request(self) -> Optional[dict]:
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._json(400, {"error": "invalid JSON body"})
                    return None
                if not isinstance(req, dict) or not isinstance(req.get("query"), str):
                    self._json(400, {"error": "body must be {\"query\": str, ...}"})
                    return None
                return req

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"status": "ok", "passages": len(outer.pipe.passages)})
                else:
                    self._json(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path == "/answer":
                    req = self._read_request()
                    if req is None:
                        return
                    h = outer.session.submit(
                        req["query"], top_k=int(req.get("top_k", 4)),
                        budget=req.get("budget"),
                    )
                    self._json(200, {
                        "answer": h.answer(),
                        "passages": h.passages,
                        "scores": h.scores,
                    })
                elif self.path == "/stream":
                    req = self._read_request()
                    if req is None:
                        return
                    h = outer.session.submit(
                        req["query"], top_k=int(req.get("top_k", 4)),
                        budget=req.get("budget"),
                    )
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; charset=utf-8")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    tok = outer.pipe.g_tok
                    marker = "#answer#"
                    sent = 0
                    ids = []
                    try:
                        for t in h.tokens():
                            ids.append(t)
                            # decode the full prefix each flush: subword/byte
                            # tokenizers cannot decode tokens independently
                            text = tok.decode(ids, skip_special_tokens=True)
                            text = text.split(marker)[0]
                            # hold back a marker-sized tail: a partially
                            # decoded stop marker must never reach the wire
                            # (sent bytes cannot be retracted)
                            safe = max(sent, len(text) - (len(marker) - 1))
                            delta = text[sent:safe]
                            if delta:
                                chunk = delta.encode("utf-8")
                                self.wfile.write(f"{len(chunk):X}\r\n".encode() + chunk + b"\r\n")
                                self.wfile.flush()
                                sent = safe
                        text = tok.decode(ids, skip_special_tokens=True).split(marker)[0]
                        tail = text[sent:].encode("utf-8")
                        if tail:
                            self.wfile.write(f"{len(tail):X}\r\n".encode() + tail + b"\r\n")
                        self.wfile.write(b"0\r\n\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        # client went away: free the decode slot immediately
                        # instead of burning its remaining budget
                        h.cancel()
                else:
                    self._json(404, {"error": "unknown path"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start_background(self) -> "RagHTTPServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True, name="rag-http")
        self._thread.start()
        logger.info("serving on http://%s:%d", self.host, self.port)
        return self

    def serve_forever(self) -> None:
        logger.info("serving on http://%s:%d", self.host, self.port)
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.session.__exit__(None, None, None)


def serve_pipeline(pipe, host: str = "127.0.0.1", port: int = 8080,
                   num_slots: int = 32, background: bool = False) -> RagHTTPServer:
    """Start an HTTP server over ``pipe``; blocks unless ``background``."""
    srv = RagHTTPServer(pipe, host=host, port=port, num_slots=num_slots)
    if background:
        return srv.start_background()
    try:
        srv.serve_forever()
    finally:
        srv.shutdown()
    return srv
