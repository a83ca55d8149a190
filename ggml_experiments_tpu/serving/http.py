"""HTTP front-end for the continuous-batching decode engine.

The reference's serving surface is an interactive stdin loop
(/root/reference/rnn_text_gen/rnn_text_generation.cpp:325-328); the
BASELINE north star extends it to production *serving*. This module puts a
network API in front of ``DecodeEngine``: a threaded stdlib HTTP server
(no extra dependencies) whose handler threads block on engine requests
while the engine's own worker thread drives the chip — many concurrent
HTTP clients feed one continuously-batched device loop.

Endpoints (JSON in/out):

* ``POST /v1/generate`` — body ``{"prompt": str, "max_new_tokens": int,
  "temperature"?: float, "stream"?: bool}``. Non-streaming replies with the
  full result; ``"stream": true`` replies with chunked newline-delimited
  JSON (one ``{"token", "text"}`` object per generated token as it lands,
  then a final ``{"done": true, ...}`` record) — chunks flush per token, so
  a client reading lines sees tokens live.
* ``GET /v1/health`` — liveness + slot occupancy.
* ``GET /v1/stats`` — the engine's ``EngineStats`` counters.
* ``DELETE /v1/requests/<id>`` — cancel a submitted request by the id the
  generate response/stream carries.

With a :class:`~.vision.VisionEngine` attached (``vision=``), the image
endpoints activate (the reference's single-image mobilevit ``main()`` as a
service):

* ``POST /v1/classify`` — body ``{"image_b64": <base64 PNG/JPEG/PPM/BMP>,
  "top_k"?: int}`` or a raw ``image/*`` body; replies with the top-k
  ``[class, logit]`` pairs. Decoding uses the framework's own codecs
  (utils/image_codecs, utils/jpeg) and the reference-exact preprocess.
* ``POST /v1/features`` — same input; replies with the feature shape and
  the reference's debug vector (first/last 5 channels at (0, 0),
  main.cpp:1225-1244); ``"full": true`` returns the whole feature map.
* ``GET /v1/vision/stats`` — the vision engine's wall breakdown.

Backpressure maps to HTTP: a full engine queue (``max_pending``) returns
429; submit validation errors return 400; an engine failure returns 500.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from ggml_experiments_tpu.serving.engine import DecodeEngine, Request
from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

_STREAM_END = object()


class HttpFrontend:
    """Serve a started ``DecodeEngine`` over HTTP.

    ``port=0`` binds an ephemeral port (read ``.port`` after ``start()``).
    The server threads only encode/decode text and block on the engine;
    all device work stays on the engine's worker thread.
    """

    def __init__(
        self,
        engine: Optional[DecodeEngine],
        tokenizer: Optional[CharTokenizer] = None,
        *,
        vision=None,
        host: str = "127.0.0.1",
        port: int = 0,
        default_max_new_tokens: int = 200,
        request_timeout_s: float = 600.0,
    ):
        if engine is None and vision is None:
            raise ValueError("HttpFrontend needs a DecodeEngine, a "
                             "VisionEngine, or both")
        self.engine = engine
        self.vision = vision
        self.tokenizer = tokenizer or CharTokenizer()
        self.default_max_new_tokens = default_max_new_tokens
        self.request_timeout_s = request_timeout_s
        self._requests: Dict[int, Request] = {}
        self._req_lock = threading.Lock()
        handler = _make_handler(self)
        self._server = ThreadingHTTPServer((host, port), handler)
        self._server.daemon_threads = True
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._server.serve_forever, daemon=True
            )
            self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self._server.server_close()

    # -- request bookkeeping -------------------------------------------------
    def _track(self, req: Request) -> None:
        with self._req_lock:
            self._requests[req.id] = req
            # bound the registry: completed requests older than the newest
            # few hundred are of no further cancel interest. Still-running
            # requests are never evicted — they must stay DELETE-cancelable.
            if len(self._requests) > 1024:
                for rid in sorted(self._requests)[:-512]:
                    r = self._requests.get(rid)
                    if r is not None and r._done.is_set():
                        self._requests.pop(rid, None)

    def find(self, req_id: int) -> Optional[Request]:
        with self._req_lock:
            return self._requests.get(req_id)


def _make_handler(front: HttpFrontend):
    tok = front.tokenizer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        server_version = "gxt-serve/1"

        # silence per-request stderr logging (MetricsLogger owns telemetry)
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _json(self, code: int, obj) -> None:
            body = (json.dumps(obj) + "\n").encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            eng = front.engine
            if self.path == "/v1/health":
                errs = [e for e in
                        (getattr(eng, "error", None),
                         getattr(front.vision, "error", None)) if e]
                out = {"status": "error" if errs else "ok"}
                if eng is not None:
                    out.update(slots=eng.n_slots,
                               active=len(eng.active_requests()),
                               pending=eng.pending_count())
                if front.vision is not None:
                    out["vision_pending"] = front.vision._pending
                self._json(200, out)
            elif self.path == "/v1/stats" and eng is not None:
                s = eng.stats
                self._json(200, {
                    "tokens_generated": s.tokens_generated,
                    "requests_completed": s.requests_completed,
                    "requests_canceled": s.requests_canceled,
                    "device_steps": s.device_steps,
                    "wall_time_s": s.wall_time_s,
                    "tokens_per_s": s.tokens_per_s,
                })
            elif self.path == "/v1/vision/stats" and front.vision is not None:
                s = front.vision.stats
                self._json(200, {
                    "images_done": s.images_done,
                    "requests_canceled": s.requests_canceled,
                    "batches": s.batches,
                    "wall_time_s": s.wall_time_s,
                    **s.breakdown(),
                })
            else:
                self._json(404, {"error": f"no such path {self.path!r}"})

        def _read_image(self):
            """Decode the request body to a preprocessed (S, S, 3) image.
            Returns (image, top_k, full) or None after replying an error."""
            import base64

            from ggml_experiments_tpu.utils import image as image_utils
            from ggml_experiments_tpu.utils import image_codecs

            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                top_k, full = 5, False
                if ctype.startswith("image/") or (body[:8] in
                        (b"\x89PNG\r\n\x1a\n",) or body[:2] in
                        (b"BM", b"P6", b"P3", b"\xff\xd8")):
                    raw = body
                else:
                    payload = json.loads(body or b"{}")
                    raw = base64.b64decode(payload["image_b64"])
                    top_k = int(payload.get("top_k", 5))
                    full = bool(payload.get("full", False))
                u8 = image_codecs.decode(raw)
                if getattr(front.vision, "transport", "f32") == "u8":
                    # ship the u8 canvas; the engine normalizes on device
                    img = image_utils.preprocess_canvas_u8(
                        u8, size=front.vision.image_size)
                else:
                    img = image_utils.preprocess(u8, size=front.vision.image_size)
                return img, top_k, full
            except (KeyError, TypeError, ValueError, json.JSONDecodeError) as ex:
                self._json(400, {"error": f"bad image request: {ex}"})
                return None

        def _vision_post(self, kind):
            if front.vision is None:
                self._json(404, {"error": "no vision engine attached"})
                return
            parsed = self._read_image()
            if parsed is None:
                return
            img, top_k, full = parsed
            try:
                req = front.vision.submit(img, kind=kind)
            except RuntimeError as ex:  # backlog / dead engine
                code = 429 if "backlog" in str(ex) else 500
                self._json(code, {"error": str(ex)})
                return
            try:
                out = req.result(timeout=front.request_timeout_s)
            except TimeoutError:
                req.cancel()
                self._json(504, {"id": req.id, "error": "inference timed out"})
                return
            except RuntimeError as ex:
                self._json(500, {"id": req.id, "error": str(ex)})
                return
            if kind == "classify":
                order = np.argsort(out)[::-1][:top_k]
                self._json(200, {
                    "id": req.id,
                    "top": [[int(i), float(out[i])] for i in order],
                })
            else:
                vec = out[0, 0]  # the reference's debug vector position
                resp = {
                    "id": req.id,
                    "shape": list(out.shape),
                    "first5": [float(v) for v in vec[:5]],
                    "last5": [float(v) for v in vec[-5:]],
                }
                if full:
                    resp["features"] = out.tolist()
                self._json(200, resp)

        def do_DELETE(self):  # noqa: N802
            prefix = "/v1/requests/"
            if not self.path.startswith(prefix):
                self._json(404, {"error": f"no such path {self.path!r}"})
                return
            try:
                rid = int(self.path[len(prefix):])
            except ValueError:
                self._json(400, {"error": "request id must be an integer"})
                return
            req = front.find(rid)
            if req is None:
                self._json(404, {"error": f"unknown request id {rid}"})
                return
            req.cancel()
            self._json(200, {"id": rid, "canceled": True})

        def do_POST(self):  # noqa: N802
            if self.path == "/v1/classify":
                self._vision_post("classify")
                return
            if self.path == "/v1/features":
                self._vision_post("features")
                return
            if self.path != "/v1/generate" or front.engine is None:
                self._json(404, {"error": f"no such path {self.path!r}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                prompt = payload["prompt"]
                if not isinstance(prompt, str) or not prompt:
                    raise ValueError("'prompt' must be a non-empty string")
                max_new = int(payload.get(
                    "max_new_tokens", front.default_max_new_tokens))
                temperature = payload.get("temperature")
                if temperature is not None:
                    temperature = float(temperature)
                stream = bool(payload.get("stream", False))
            except (KeyError, TypeError, ValueError, json.JSONDecodeError) as ex:
                self._json(400, {"error": f"bad request: {ex}"})
                return

            if front.engine.error is not None:
                self._json(500, {"error": f"engine failed: {front.engine.error!r}"})
                return

            prompt_ids = tok.encode(prompt[: front.engine.max_prompt])
            token_q: "queue.Queue" = queue.Queue() if stream else None
            try:
                req = front.engine.submit(
                    prompt_ids, max_new, temperature=temperature,
                    on_token=token_q.put if stream else None,
                )
            except ValueError as ex:
                self._json(400, {"error": str(ex)})
                return
            except RuntimeError as ex:  # backpressure
                self._json(429, {"error": str(ex)})
                return
            front._track(req)

            if not stream:
                try:
                    tokens = req.result(timeout=front.request_timeout_s)
                except TimeoutError:
                    req.cancel()
                    self._json(504, {"id": req.id, "error": "generation timed out"})
                    return
                except RuntimeError as ex:
                    self._json(500, {"id": req.id, "error": str(ex)})
                    return
                self._json(200, {
                    "id": req.id,
                    "tokens": [int(t) for t in tokens],
                    "text": tok.decode(int(t) for t in tokens),
                    "canceled": req.canceled,
                })
                return

            # streaming: chunked NDJSON, one line per token as it lands.
            # A watcher thread turns request completion into a sentinel so
            # this handler never hangs on a canceled/failed request.
            def _watch():
                try:
                    req.result(timeout=front.request_timeout_s)
                except TimeoutError:
                    req.cancel()  # timed-out stream: free the decode slot
                except Exception:
                    pass
                token_q.put(_STREAM_END)

            threading.Thread(target=_watch, daemon=True).start()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(obj) -> bool:
                data = (json.dumps(obj) + "\n").encode()
                try:
                    self.wfile.write(f"{len(data):x}\r\n".encode())
                    self.wfile.write(data + b"\r\n")
                    self.wfile.flush()
                    return True
                except (BrokenPipeError, ConnectionResetError):
                    req.cancel()  # client went away: free the slot
                    return False

            if not chunk({"id": req.id}):
                return
            n = 0
            while True:
                t = token_q.get()
                if t is _STREAM_END:
                    break
                n += 1
                if not chunk({"token": int(t), "text": tok.decode([int(t)])}):
                    return
            err = None
            try:
                req.result(timeout=0.001)
            except Exception as ex:  # canceled results don't raise; real errors do
                err = str(ex)
            final = {"done": True, "id": req.id, "generated": n,
                     "canceled": req.canceled}
            if err:
                final["error"] = err
            if chunk(final):
                try:
                    self.wfile.write(b"0\r\n\r\n")
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass

    return Handler
