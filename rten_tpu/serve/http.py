"""HTTP/JSON serving API over the continuous-batching engine.

The remote-bindings surface of the framework — the TPU-serving counterpart
of the reference's WASM/JS API (src/wasm_api.rs:15-211 exposes Model/Tensor
to browser clients; a TPU host serves over the network instead). Stdlib-only
(ThreadingHTTPServer), JSON in/out:

    POST /generate  {"prompt": [ids...], "max_new_tokens": N, "eos": [ids]}
                    → {"request_id": i, "tokens": [ids...]}
    GET  /healthz   → {"status": "ok", "active": n, "queued": n, "steps": n}
    GET  /stats     → engine + model counters

A background thread drives engine.step() whenever there is work, so
concurrent requests batch together into single decode programs.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from rten_tpu.serve.engine import Request, ServingEngine


class ServingServer:
    def __init__(self, engine: ServingEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._stop = threading.Event()
        self._driver = threading.Thread(target=self._drive, daemon=True)

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    with outer._lock:
                        self._reply(
                            200,
                            {
                                "status": "ok",
                                "active": outer.engine.n_active,
                                "queued": len(outer.engine.queue),
                                "steps": outer.engine.steps,
                            },
                        )
                elif self.path == "/stats":
                    with outer._lock:
                        self._reply(
                            200,
                            {
                                "steps": outer.engine.steps,
                                "max_batch": outer.engine.max_batch,
                                "max_len": outer.engine.max_len,
                            },
                        )
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    prompt = [int(t) for t in payload["prompt"]]
                except (ValueError, KeyError) as e:
                    self._reply(400, {"error": f"bad request: {e}"})
                    return
                done = threading.Event()
                req = Request(
                    prompt=prompt,
                    max_new_tokens=int(payload.get("max_new_tokens", 32)),
                    eos_tokens=tuple(payload.get("eos", ())),
                )
                req._done_event = done  # type: ignore[attr-defined]
                with outer._lock:
                    outer.engine.submit(req)
                outer._work.set()
                done.wait(timeout=300)
                self._reply(
                    200,
                    {
                        "request_id": req.request_id,
                        "tokens": req.output,
                        "finished": req.finished,
                    },
                )

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def start(self) -> None:
        self._driver.start()
        self._http_thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._work.set()
        self.httpd.shutdown()
        self._driver.join(timeout=5)

    def _drive(self) -> None:
        while not self._stop.is_set():
            self._work.wait(timeout=0.1)
            did_work = False
            with self._lock:
                if self.engine.has_work():
                    finished = self.engine.step()
                    did_work = True
                    for req in finished:
                        ev = getattr(req, "_done_event", None)
                        if ev is not None:
                            ev.set()
            if not did_work:
                self._work.clear()
