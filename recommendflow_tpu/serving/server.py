"""Online serving: a stdlib HTTP server over the exported model / encoder.

The reference delegates online encode to an external `bert_serving` service
(backend/encoder/bert_encoder.py:22,85-101) and online ranking to frozen
pb/ONNX graphs behind some serving stack (backend/utils/onnx_utils.py:
102-137). This module supplies the in-framework equivalent: one process
serving
  * POST /encode  {"texts": [...], "normalize": true}
        -> {"embeddings": [[...], ...], "dim": D}
    backed by a TextEncoderService (tokenize + TPU encode + whitening +
    LRU cache),
  * POST /predict {"batch": {feature: nested lists}}
        -> {outputs: nested lists}
    backed by a ServingModel (.rfx StableHLO export),
  * GET  /health  -> {"status": "ok", "device": ..., "endpoints": [...]}.

Threading model: ThreadingHTTPServer accepts concurrently; encode/predict
calls funnel through a lock (one jitted computation in flight — the TPU is
serial anyway, and the encoder's LRU cache is not thread-safe under
concurrent mutation).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict

import numpy as np


class EncodeServer:
    """Bundles the serveable backends + dispatch table."""

    def __init__(self, encoder=None, serving_model=None, max_batch: int = 4096):
        if encoder is None and serving_model is None:
            raise ValueError("need an encoder and/or a serving model to serve")
        self.encoder = encoder
        self.serving_model = serving_model
        self.max_batch = max_batch
        self._lock = threading.Lock()
        self.requests_served = 0

    # ----------------------------------------------------------- handlers
    def handle_health(self, _payload) -> Dict[str, Any]:
        import jax
        endpoints = ["/health"]
        if self.encoder is not None:
            endpoints.append("/encode")
        if self.serving_model is not None:
            endpoints.append("/predict")
        return {"status": "ok",
                "device": jax.devices()[0].platform,
                "requests_served": self.requests_served,
                "endpoints": endpoints}

    def handle_encode(self, payload) -> Dict[str, Any]:
        if self.encoder is None:
            raise LookupError("no encoder loaded on this server")
        texts = payload.get("texts")
        if not isinstance(texts, list) or not all(isinstance(t, str) for t in texts):
            raise ValueError("'texts' must be a list of strings")
        if len(texts) > self.max_batch:
            raise ValueError(f"batch too large ({len(texts)} > {self.max_batch})")
        normalize = bool(payload.get("normalize", True))
        with self._lock:
            emb = self.encoder.encode(texts, normalize=normalize)
            self.requests_served += 1
        return {"embeddings": np.asarray(emb).tolist(),
                "dim": int(emb.shape[1]) if len(emb) else 0}

    def handle_predict(self, payload) -> Dict[str, Any]:
        if self.serving_model is None:
            raise LookupError("no serving model loaded on this server")
        batch_in = payload.get("batch")
        if not isinstance(batch_in, dict):
            raise ValueError("'batch' must be a dict of feature arrays")
        batch = {k: np.asarray(v) for k, v in batch_in.items()}
        sizes = {len(v) for v in batch.values() if v.ndim}
        if sizes and max(sizes) > self.max_batch:
            raise ValueError(f"batch too large ({max(sizes)} > {self.max_batch})")
        with self._lock:
            out = self.serving_model.predict(batch)
            self.requests_served += 1
        if isinstance(out, dict):
            return {k: np.asarray(v).tolist() for k, v in out.items()}
        return {"output": np.asarray(out).tolist()}

    def dispatch(self, path: str, payload) -> Dict[str, Any]:
        table = {"/health": self.handle_health,
                 "/encode": self.handle_encode,
                 "/predict": self.handle_predict}
        if path not in table:
            raise LookupError(f"unknown endpoint {path}")
        return table[path](payload)


class _Handler(BaseHTTPRequestHandler):
    server_version = "recflow-serve/1"
    backend: EncodeServer  # set by make_server

    def log_message(self, fmt, *args):  # quiet by default; logger has it
        from recommendflow_tpu.utils.logger import get_logger
        get_logger("recflow.serve").debug(fmt % args)

    def _reply(self, code: int, obj: Dict[str, Any]):
        body = json.dumps(obj).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        try:
            self._reply(200, self.backend.dispatch(self.path, {}))
        except LookupError as e:
            self._reply(404, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — serving must not die
            self._reply(500, {"error": str(e)})

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            self._reply(200, self.backend.dispatch(self.path, payload))
        except LookupError as e:
            self._reply(404, {"error": str(e)})
        except (ValueError, KeyError, TypeError) as e:
            self._reply(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001
            self._reply(500, {"error": str(e)})


def make_server(backend: EncodeServer, host: str = "0.0.0.0",
                port: int = 8500) -> ThreadingHTTPServer:
    """Build the HTTP server (call .serve_forever(), or run it in a thread
    for tests; .server_address[1] gives the bound port when port=0)."""
    handler = type("BoundHandler", (_Handler,), {"backend": backend})
    return ThreadingHTTPServer((host, port), handler)
