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
