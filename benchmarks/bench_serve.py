"""Load-test the serving stack on the real device (VERDICT r1 item 9).

Starts cli/serve's EncodeServer in-process (real TextEncoderService on the
default backend) and fires concurrent HTTP clients at /encode, A/B-ing the
micro-batching window against the plain lock path in ONE process (tunnel
drift makes cross-process comparisons unreliable — CLAUDE.md).

Usage: python benchmarks/bench_serve.py [--clients 16] [--reqs 30]
       [--texts_per_req 4] [--layers 4] [--dim 256]
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import numpy as np


def _post(url, payload):
    req = urllib.request.Request(
        url + "/encode", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def run_load(url, n_clients, n_reqs, texts_per_req, words):
    rng = np.random.default_rng(0)
    lat = []
    errors = []

    def client(ci):
        r2 = np.random.default_rng(ci)
        for _ in range(n_reqs):
            texts = [" ".join(r2.choice(words, size=6))
                     for _ in range(texts_per_req)]
            t0 = time.perf_counter()
            try:
                _post(url, {"texts": texts})
                lat.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total = n_clients * n_reqs
    assert not errors, errors[:3]
    return {"req_per_s": round(total / dt, 1),
            "texts_per_s": round(total * texts_per_req / dt, 1),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--reqs", type=int, default=30)
    ap.add_argument("--texts_per_req", type=int, default=4)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=256)
    args = ap.parse_args()

    from recommendflow_tpu.encoder.text_encoder import TextEncoderService
    from recommendflow_tpu.encoder.tokenizer import Tokenizer
    from recommendflow_tpu.serving import EncodeServer, make_server

    words = ("search rank click buy phone game music video news shop app "
             "store play read watch food travel sport photo chat mail map "
             "bank car home work learn code data cloud smart fast").split()
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + words +
        [w + "s" for w in words])}
    svc = TextEncoderService(Tokenizer(vocab), max_len=16,
                             batch_size=args.batch_size, cache_size=0,
                             num_layers=args.layers, model_dim=args.dim)
    svc.encode(["warm up"])  # compile off the clock

    for window in (4.0, 0.0):  # batched vs plain-lock, interleaved
        backend = EncodeServer(encoder=svc, max_batch=4096,
                               batch_window_ms=window)
        httpd = make_server(backend, host="127.0.0.1", port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        stats = run_load(url, args.clients, args.reqs, args.texts_per_req,
                         words)
        stats["mode"] = f"window={window}ms"
        if backend._batcher is not None:
            stats["coalesce"] = round(
                backend._batcher.requests_batched
                / max(backend._batcher.batches_run, 1), 2)
        print(json.dumps(stats))
        httpd.shutdown()


if __name__ == "__main__":
    main()
