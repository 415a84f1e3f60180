"""HTTP serving: /encode, /predict, /health + remote client with fallback.

Parity surface: the reference's external bert-serving service and its
client-with-timeout-fallback (bert_encoder.py:22,79-117), plus the frozen
graph online encoder (onnx_utils.py:102-137) — here one in-framework
process (cli/serve.py) over stdlib HTTP.
"""
import json
import threading
import urllib.request

import numpy as np
import pytest

from recommendflow_tpu.serving import EncodeServer, RemoteEncoderClient, make_server


class FakeEncoder:
    """Deterministic stand-in (no TPU model needed to test the HTTP layer)."""
    dim = 8

    def encode(self, texts, normalize=True):
        if not texts:  # real TextEncoderService returns (0, dim) too
            return np.zeros((0, self.dim), np.float32)
        out = np.stack([np.full(self.dim, float(len(t)) + 1.0) for t in texts])
        if normalize:
            out = out / np.linalg.norm(out, axis=1, keepdims=True)
        return out.astype(np.float32)


class FakeServingModel:
    def predict(self, batch):
        return {"score": np.asarray(batch["x"]).sum(axis=-1)}


@pytest.fixture(scope="module")
def server():
    backend = EncodeServer(encoder=FakeEncoder(),
                           serving_model=FakeServingModel(), max_batch=16)
    httpd = make_server(backend, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=5) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert set(h["endpoints"]) == {"/health", "/encode", "/predict"}


def test_health_with_query_string(server):
    """Load balancers append cache-busters — the path must dispatch with
    the query stripped (was a 404; review finding)."""
    with urllib.request.urlopen(server + "/health?probe=1", timeout=5) as r:
        assert json.loads(r.read())["status"] == "ok"
    # GET on a POST-shaped endpoint is a client error, not a 500
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/encode", timeout=5)
    assert e.value.code == 400


def test_encode_endpoint(server):
    out = _post(server, "/encode", {"texts": ["ab", "xyz"], "normalize": False})
    emb = np.asarray(out["embeddings"])
    assert emb.shape == (2, 8) and out["dim"] == 8
    assert np.allclose(emb[0], 3.0) and np.allclose(emb[1], 4.0)


def test_predict_endpoint(server):
    out = _post(server, "/predict", {"batch": {"x": [[1, 2], [3, 4]]}})
    assert out["score"] == [3, 7]


def test_errors(server):
    # oversize batch -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/encode", {"texts": ["a"] * 17})
    assert e.value.code == 400
    # bad payload -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/encode", {"texts": "not-a-list"})
    assert e.value.code == 400
    # unknown endpoint -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", {})
    assert e.value.code == 404


def test_remote_client_roundtrip(server):
    client = RemoteEncoderClient(server, local=None)
    assert client.ping()
    emb = client.encode(["hello"], normalize=False)
    assert emb.shape == (1, 8) and np.allclose(emb, 6.0)


def test_remote_client_fallback_to_local():
    # nothing listens on this port -> immediate local fallback
    client = RemoteEncoderClient("http://127.0.0.1:1", local=FakeEncoder(),
                                 connect_timeout=0.2, request_timeout=0.2)
    emb = client.encode(["ab"], normalize=False)
    assert np.allclose(emb, 3.0)
    assert client._alive is False
    # no local fallback -> loud failure
    dead = RemoteEncoderClient("http://127.0.0.1:1", connect_timeout=0.2)
    with pytest.raises(RuntimeError):
        dead.encode(["x"])


def test_serve_cli_with_real_encoder(tmp_path):
    """End-to-end: real TextEncoderService behind the HTTP layer."""
    from recommendflow_tpu.encoder import TextEncoderService, Tokenizer
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + [chr(c) for c in range(97, 123)]))
    service = TextEncoderService(Tokenizer(str(vocab)), max_len=8,
                                 batch_size=4, model_dim=32, num_layers=1)
    backend = EncodeServer(encoder=service)
    httpd = make_server(backend, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        out = _post(url, "/encode", {"texts": ["abc", "xyz"]})
        emb = np.asarray(out["embeddings"], np.float32)
        assert emb.shape[0] == 2 and emb.shape[1] == out["dim"]
        assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
        # client path against the live server
        client = RemoteEncoderClient(url)
        emb2 = client.encode(["abc", "xyz"])
        assert np.allclose(emb2, emb, atol=1e-5)
    finally:
        httpd.shutdown()


# ------------------------------------------------------- micro-batching
class SlowCountingEncoder(FakeEncoder):
    """Counts encode calls; sleeps to widen the coalescing window."""

    def __init__(self, delay=0.05):
        self.calls = 0
        self.delay = delay

    def encode(self, texts, normalize=True):
        import time
        self.calls += 1
        time.sleep(self.delay)
        return super().encode(texts, normalize)


def test_microbatcher_coalesces_and_preserves_results():
    """Concurrent requests must coalesce into fewer device batches and every
    client must get exactly its own rows back (VERDICT r1 item 9)."""
    from recommendflow_tpu.serving.server import _MicroBatcher
    enc = SlowCountingEncoder(delay=0.05)
    b = _MicroBatcher(enc.encode, window_ms=30.0, max_batch=64)
    results = {}

    def client(i):
        texts = [f"{'x' * (i + 1)}", f"{'y' * (i + 2)}"]
        results[i] = (texts, b.encode(texts, normalize=False))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert enc.calls < 12, f"no coalescing happened ({enc.calls} calls)"
    ref = FakeEncoder()
    for i, (texts, got) in results.items():
        np.testing.assert_allclose(got, ref.encode(texts, normalize=False),
                                   err_msg=f"client {i} got wrong rows")


def test_microbatcher_mixed_normalize_and_errors():
    from recommendflow_tpu.serving.server import _MicroBatcher

    def encode(texts, normalize=True):
        if any("BOOM" in t for t in texts):
            raise ValueError("poisoned batch")
        return FakeEncoder().encode(texts, normalize)

    b = _MicroBatcher(encode, window_ms=20.0, max_batch=64)
    out = {}

    def client(i, norm):
        try:
            out[i] = b.encode([f"t{i}"], normalize=norm)
        except ValueError as e:
            out[i] = e

    threads = [threading.Thread(target=client, args=(i, i % 2 == 0))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # normalized and unnormalized clients both got correct rows
    for i in range(6):
        want = FakeEncoder().encode([f"t{i}"], normalize=i % 2 == 0)
        np.testing.assert_allclose(out[i], want)
    # a poisoned text fails ITS request (and batchmates), not the server
    err = None
    def bad():
        nonlocal err
        try:
            b.encode(["BOOM"])
        except ValueError as e:
            err = e
    t = threading.Thread(target=bad)
    t.start(); t.join()
    assert isinstance(err, ValueError)
    ok = b.encode(["fine"])           # batcher still alive afterwards
    assert ok.shape == (1, 8)
    b.close()


def test_concurrent_load_through_http():
    """Load test: 8 concurrent clients x 20 requests through the real HTTP
    stack with micro-batching on; all responses correct, qps recorded."""
    import time
    enc = SlowCountingEncoder(delay=0.002)
    backend = EncodeServer(encoder=enc, max_batch=512, batch_window_ms=4.0)
    httpd = make_server(backend, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    n_clients, n_reqs = 8, 20
    errors = []

    def client(ci):
        for r in range(n_reqs):
            texts = [f"{'a' * (ci + 1)}", f"{'b' * (r % 5 + 1)}"]
            try:
                resp = _post(url, "/encode", {"texts": texts,
                                              "normalize": False})
                got = np.asarray(resp["embeddings"])
                want = FakeEncoder().encode(texts, normalize=False)
                np.testing.assert_allclose(got, want, rtol=1e-5)
            except Exception as e:  # noqa: BLE001
                errors.append((ci, r, repr(e)))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    httpd.shutdown()
    assert not errors, errors[:3]
    total = n_clients * n_reqs
    qps = total / dt
    print(f"\nserve load test: {total} reqs, {qps:.0f} req/s, "
          f"{enc.calls} device batches (coalesce x{total / enc.calls:.1f})")
    assert enc.calls < total, "micro-batching never coalesced under load"

def test_client_mistakes_are_400_not_500(server):
    """Top-level JSON list/string bodies and oversized Content-Length are
    the client's fault: 400/413, never 500."""
    import urllib.error
    for bad in (b"[]", b'"hello"', b"42"):
        req = urllib.request.Request(
            server + "/encode", data=bad,
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=5)
        assert e.value.code == 400, bad
    # a huge declared body is rejected before being buffered
    req = urllib.request.Request(
        server + "/encode", data=b"{}",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(1 << 34)}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=5)
    assert e.value.code == 413


def test_empty_texts_reports_true_dim(server):
    out = _post(server, "/encode", {"texts": []})
    assert out["embeddings"] == []
    assert out["dim"] == FakeEncoder.dim


def test_nonfinite_output_is_500_not_invalid_json():
    class NanModel:
        def predict(self, batch):
            return {"score": np.asarray([float("nan")])}

    import urllib.error
    backend = EncodeServer(serving_model=NanModel(), max_batch=16)
    httpd = make_server(backend, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, "/predict", {"batch": {"x": [[1.0]]}})
        assert e.value.code == 500
        body = json.loads(e.value.read())
        assert "non-finite" in body["error"]
    finally:
        httpd.shutdown()
        backend.close()


def test_warmup_does_not_fit_whitening():
    """cli/serve warms up via warmup(): it must compile without claiming
    the whitening statistics, and a 1-text first encode with whitening
    enabled fails fast with a clear message instead of an SVD crash."""
    from recommendflow_tpu.encoder import TextEncoderService, Tokenizer, \
        build_demo_vocab
    svc = TextEncoderService(Tokenizer(build_demo_vocab(["hello", "there"])),
                             max_len=8, model_dim=16, num_layers=1,
                             use_whitening=True, whitening_dim=8)
    svc.warmup()
    assert not svc._whitening_fit
    with pytest.raises(ValueError, match="whitening auto-fit"):
        svc.encode(["hello"])
    out = svc.encode(["hello there", "there hello", "hello", "there"])
    assert svc._whitening_fit and out.shape == (4, 8)


def test_encode_rejects_bare_string():
    from recommendflow_tpu.encoder import TextEncoderService, Tokenizer, \
        build_demo_vocab
    svc = TextEncoderService(Tokenizer(build_demo_vocab(["hi"])), max_len=8,
                             model_dim=16, num_layers=1)
    with pytest.raises(TypeError, match="list of texts"):
        svc.encode("hello world")


def test_tokenizer_pickle_drops_native_handle():
    """The native WordPiece handle indexes a PER-PROCESS registry; a
    pickled copy must rebuild lazily instead of dereferencing a stale
    slot."""
    import pickle
    from recommendflow_tpu.encoder import Tokenizer, build_demo_vocab
    tok = Tokenizer(build_demo_vocab(["hello", "world"]))
    tok.encode_batch(["hello"], 8)  # may cache a native handle
    clone = pickle.loads(pickle.dumps(tok))
    assert not hasattr(clone, "_native_handle_cached")
    ids1, _ = tok.encode_batch(["hello world"], 8)
    ids2, _ = clone.encode_batch(["hello world"], 8)
    np.testing.assert_array_equal(ids1, ids2)


def test_load_weights_resets_stale_whitening(tmp_path):
    """Weights reloaded WITHOUT a whitening sidecar must not keep stats
    fit on the old embedding space."""
    from recommendflow_tpu.encoder import TextEncoderService, Tokenizer, \
        build_demo_vocab
    tok = Tokenizer(build_demo_vocab(["hello", "there", "world", "again"]))
    svc = TextEncoderService(tok, max_len=8, model_dim=16, num_layers=1,
                             use_whitening=True, whitening_dim=8)
    svc.encode(["hello there", "world again", "hello world"])
    assert svc._whitening_fit
    # save WITHOUT whitening: a fresh service (never fit) writes none
    fresh = TextEncoderService(tok, max_len=8, model_dim=16, num_layers=1,
                               seed=7)
    d = str(tmp_path / "w")
    fresh.save(d)
    svc.load_weights(d)
    assert not svc._whitening_fit  # stale stats dropped; refits next call
