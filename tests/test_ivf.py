"""IvfSearcher: approximate retrieval correctness vs the exact searcher.

Parity surface: FAISS 'IVF{n},Flat' via index_factory
(faiss_searcher.py:80-97) with the nprobe attribute.
"""
import numpy as np
import pytest

from recommendflow_tpu.retrieval import IvfSearcher, TpuSearcher, index_factory, kmeans


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(0)
    # clustered corpus (IVF's intended regime): 32 latent clusters
    centers = rng.randn(32, 16).astype(np.float32) * 3
    vecs = (centers[rng.randint(32, size=4000)] +
            rng.randn(4000, 16).astype(np.float32))
    queries = (centers[rng.randint(32, size=64)] +
               0.5 * rng.randn(64, 16).astype(np.float32))
    return vecs, queries


def test_kmeans_assigns_all_clusters():
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    x = rng.randn(1000, 8).astype(np.float32)
    c = np.asarray(kmeans(jnp.asarray(x), 16, iters=5))
    assert c.shape == (16, 8)
    assert np.isfinite(c).all()
    # centroids spread out (not collapsed to one point)
    assert np.std(c, axis=0).mean() > 0.1


@pytest.mark.parametrize("metric", ["cos", "ip", "l2"])
def test_ivf_recall_vs_exact(corpus, metric):
    vecs, queries = corpus
    exact = TpuSearcher(16, metric).train(vecs)
    ivf = IvfSearcher(16, metric, nlist=64, nprobe=16, seed=0).train(vecs)
    _, _, eidx = exact.search(queries, topk=10)
    _, _, iidx = ivf.search(queries, topk=10)
    recall = np.mean([len(set(a) & set(b)) / 10.0 for a, b in zip(eidx, iidx)])
    assert recall > 0.9, f"{metric}: IVF recall@10 vs exact = {recall}"


def test_ivf_full_probe_is_exact(corpus):
    """nprobe == nlist scans everything -> identical results to exact."""
    vecs, queries = corpus
    exact = TpuSearcher(16, "cos").train(vecs)
    ivf = IvfSearcher(16, "cos", nlist=16, nprobe=16, cap_factor=1.2).train(vecs)
    _, es, eidx = exact.search(queries, topk=5)
    _, is_, iidx = ivf.search(queries, topk=5)
    assert np.allclose(np.sort(es, axis=1), np.sort(is_, axis=1), atol=1e-5)


def test_ivf_overflow_pool_preserves_capped_items():
    """Items over a tiny cap land in the always-scanned overflow pool and
    remain retrievable (capping must never lose recall silently)."""
    rng = np.random.RandomState(2)
    vecs = rng.randn(500, 8).astype(np.float32)
    ivf = IvfSearcher(8, "cos", nlist=4, nprobe=1, cap_factor=0.1).train(vecs)
    assert len(ivf._overflow_idx) > 0
    # self-retrieval of an overflow item must hit itself at rank 1
    probe = int(ivf._overflow_idx[0])
    _, _, idx = ivf.search(vecs[probe], topk=1)
    assert idx[0, 0] == probe


def test_ivf_items_and_topk_list(corpus):
    vecs, queries = corpus
    items = np.asarray([f"item_{i}" for i in range(len(vecs))])
    ivf = IvfSearcher(16, "cos", nlist=32, nprobe=8).train(vecs, items=items)
    got_items, scores, idx = ivf.search(queries[:4], topk=[3, 5])
    assert set(got_items) == {3, 5}
    assert got_items[5].shape == (4, 5)
    assert got_items[3][0, 0].startswith("item_")


def test_ivf_save_load_pickle(tmp_path, corpus):
    vecs, queries = corpus
    ivf = IvfSearcher(16, "cos", nlist=32, nprobe=32).train(vecs)
    _, _, before = ivf.search(queries[:8], topk=5)
    p = str(tmp_path / "ivf.npz")
    ivf.save(p)
    loaded = IvfSearcher.load(p)
    _, _, after = loaded.search(queries[:8], topk=5)
    assert np.array_equal(before, after)

    ivf.dump(str(tmp_path / "ivf.pkl"))
    unpickled = IvfSearcher.load_pickle(str(tmp_path / "ivf.pkl"))
    _, _, after2 = unpickled.search(queries[:8], topk=5)
    assert np.array_equal(before, after2)


def test_index_factory():
    assert isinstance(index_factory(8, "Flat"), TpuSearcher)
    s = index_factory(8, "IVF256,Flat", metric="ip")
    assert isinstance(s, IvfSearcher) and s.nlist == 256 and s.metric == "ip"
    assert isinstance(index_factory(8, "IVF64"), IvfSearcher)
    with pytest.raises(ValueError):
        index_factory(8, "HNSW32")


def test_ivf_topk_beyond_candidate_pool():
    """k <= num_items but k > nprobe*list_cap + overflow must pad (FAISS
    pads with -1; we pad scores with NEG / indices with 0) instead of
    crashing lax.top_k (regression: review finding, searcher.py)."""
    rng = np.random.RandomState(0)
    v = rng.randn(2000, 16).astype(np.float32)
    s = IvfSearcher(16, "cos", nlist=100, nprobe=1).train(v)
    pool = s.nprobe * int(s._lists.shape[1]) + int(s._overflow.shape[0])
    assert pool < 100, "setup must make the candidate pool smaller than k"
    scores, idx = s.search(v[:4], topk=100, return_items=False)
    assert scores.shape == (4, 100) and idx.shape == (4, 100)
    # real candidates come first; the pad tail is NEG-scored
    assert np.all(scores[:, pool:] < -1e20)
    assert np.all(scores[:, 0] > 0.99)  # self-match still found


def test_ivf_save_restores_quantizer_params(tmp_path):
    """save/load must persist cap_factor/kmeans_iters/train_sample/seed so
    the rebuilt index equals the one the user validated and saved."""
    rng = np.random.RandomState(1)
    v = rng.randn(1500, 8).astype(np.float32)
    s = IvfSearcher(8, "cos", nlist=32, nprobe=4, cap_factor=4.0,
                    kmeans_iters=25, seed=7).train(v)
    p = str(tmp_path / "ivf_params.npz")
    s.save(p)
    loaded = IvfSearcher.load(p)
    assert (loaded.cap_factor, loaded.kmeans_iters, loaded.seed,
            loaded.train_sample) == (4.0, 25, 7, s.train_sample)
    a, ia = s.search(v[:16], topk=9, return_items=False)
    b, ib = loaded.search(v[:16], topk=9, return_items=False)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert np.array_equal(ia, ib)


# ---------------------------------------------------------------------- PQ
@pytest.fixture(scope="module")
def pq_world():
    """Self-retrieval regime where PQ should shine: isotropic items whose
    inter-item separations dwarf the quantization error."""
    rng = np.random.RandomState(7)
    corpus = rng.randn(5000, 32).astype(np.float32)
    queries = corpus[:100] + rng.randn(100, 32).astype(np.float32) * 0.01
    return corpus, queries


def test_pq_factory_and_recall(pq_world):
    from recommendflow_tpu.retrieval.searcher import PqSearcher
    corpus, q = pq_world
    pq = index_factory(32, "PQ8", "cos", item_block=1024)
    assert isinstance(pq, PqSearcher)
    assert isinstance(index_factory(32, "PQ16x8", "cos"), PqSearcher)
    pq.train(corpus)
    _, _, idx = pq.search(q, topk=10)
    hit1 = np.mean(idx[:, 0] == np.arange(100))
    assert hit1 >= 0.9, f"self-retrieval hit@1 {hit1}"


def test_pq_matches_bruteforce_over_reconstruction(pq_world):
    """The block decode-and-score scan returns the same ranking as brute
    force over the decoded corpus (modulo bf16 decode rounding near ties),
    and the reconstruction error is small."""
    from recommendflow_tpu.retrieval.searcher import PqSearcher
    corpus, q = pq_world
    pq = PqSearcher(32, "cos", num_subspaces=8, item_block=1024).train(corpus)
    _, _, idx = pq.search(q, topk=10)
    recon = pq.reconstruct(np.arange(len(corpus))).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    bf = np.argsort(-(qn @ recon.T), axis=1)[:, :10]
    agree = np.mean([len(set(bf[i]) & set(idx[i])) / 10 for i in range(len(q))])
    assert agree >= 0.9, f"scan vs brute-force agreement {agree}"
    vn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    rel = np.linalg.norm(recon - vn) / np.linalg.norm(vn)
    # 8 subspaces x 8 bits on isotropic gaussian data = 2 bits/dim: ~0.28
    # relative distortion is the information-theoretic ballpark
    assert rel < 0.35, f"reconstruction rel err {rel}"


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_pq_metrics_run(pq_world, metric):
    from recommendflow_tpu.retrieval.searcher import PqSearcher
    corpus, q = pq_world
    pq = PqSearcher(32, metric, num_subspaces=8, item_block=1024).train(corpus)
    s, idx = pq.search(q[:20], topk=5, return_items=False)
    assert s.shape == idx.shape == (20, 5)
    if metric == "l2":
        assert (s >= 0).all()
        assert (np.diff(s, axis=1) >= -1e-5).all()   # ascending distance
    hit1 = np.mean(idx[:, 0] == np.arange(20))
    assert hit1 >= 0.9


def test_pq_persistence_roundtrip(pq_world, tmp_path):
    import pickle

    from recommendflow_tpu.retrieval.searcher import PqSearcher
    corpus, q = pq_world
    pq = PqSearcher(32, "cos", num_subspaces=8, item_block=1024).train(
        corpus, items=np.arange(5000) + 100)
    it, s, idx = pq.search(q, topk=5)
    pq.save(str(tmp_path / "pq.npz"))
    pq2 = PqSearcher.load(str(tmp_path / "pq.npz"))
    it2, s2, idx2 = pq2.search(q, topk=5)
    np.testing.assert_array_equal(idx2, idx)
    np.testing.assert_array_equal(it2, it)
    pq3 = pickle.loads(pickle.dumps(pq))
    _, _, idx3 = pq3.search(q, topk=5)
    np.testing.assert_array_equal(idx3, idx)
    with pytest.raises(NotImplementedError):
        pq.add(corpus[:5])


def test_pq_edge_cases():
    from recommendflow_tpu.retrieval.searcher import PqSearcher
    rng = np.random.RandomState(3)
    # corpus smaller than one item block; k > num_items clamps to num_items
    vecs = rng.randn(37, 16).astype(np.float32)
    pq = PqSearcher(16, "cos", num_subspaces=4, item_block=64).train(vecs)
    s, idx = pq.search(vecs[:5], topk=50, return_items=False)
    assert s.shape == (5, 37)          # clamped to num_items by base search
    with pytest.raises(ValueError):
        PqSearcher(30, "cos", num_subspaces=8)   # dim not divisible


def test_pq_load_roundtrips_tuning_knobs(tmp_path):
    """npz save/load keeps query_block/seed/kmeans_iters/train_sample —
    previously reset to defaults (review finding)."""
    from recommendflow_tpu.retrieval.searcher import PqSearcher
    rng = np.random.RandomState(9)
    vecs = rng.randn(200, 16).astype(np.float32)
    pq = PqSearcher(16, "cos", num_subspaces=4, item_block=64,
                    query_block=256, seed=7, kmeans_iters=4,
                    train_sample=128).train(vecs)
    p = str(tmp_path / "pq.npz")
    pq.save(p)
    s = PqSearcher.load(p)
    assert (s.query_block, s.seed, s.kmeans_iters, s.train_sample) == \
        (256, 7, 4, 128)
    _, i1 = pq.search(vecs[:3], topk=5, return_items=False)
    _, i2 = s.search(vecs[:3], topk=5, return_items=False)
    np.testing.assert_array_equal(i1, i2)


# ------------------------------------------------------------------- IVFPQ
@pytest.fixture(scope="module")
def ivfpq_world():
    """Clustered corpus (IVF's regime) with enough spread for PQ codes."""
    rng = np.random.RandomState(11)
    centers = rng.randn(24, 32).astype(np.float32) * 4
    corpus = (centers[rng.randint(24, size=4000)] +
              rng.randn(4000, 32).astype(np.float32))
    queries = corpus[:64] + rng.randn(64, 32).astype(np.float32) * 0.01
    return corpus, queries


def test_ivfpq_factory_and_recall(ivfpq_world):
    """16 subspaces x 8 bits = 16 bytes/vec (8x compression at D=32):
    measured hit@1 0.984 / self-in-top10 1.0 on this clustered world;
    8 subspaces halves that — quantization distortion, not a scan bug
    (the full-probe agreement test pins scan correctness)."""
    from recommendflow_tpu.retrieval.searcher import IvfPqSearcher
    corpus, q = ivfpq_world
    s = index_factory(32, "IVF32,PQ16", "cos", nprobe=8)
    assert isinstance(s, IvfPqSearcher)
    assert isinstance(index_factory(32, "IVF16,PQ16x8", "cos"), IvfPqSearcher)
    s.train(corpus)
    _, _, idx = s.search(q, topk=10)
    hit1 = np.mean(idx[:, 0] == np.arange(64))
    assert hit1 >= 0.9, f"self-retrieval hit@1 {hit1}"


def test_ivfpq_full_probe_matches_bruteforce_over_reconstruction(ivfpq_world):
    """nprobe == nlist scans every list: the scan's ranking must agree with
    brute force over reconstruct() (modulo bf16 LUT rounding near ties)."""
    from recommendflow_tpu.retrieval.searcher import IvfPqSearcher
    corpus, q = ivfpq_world
    s = IvfPqSearcher(32, "cos", nlist=16, nprobe=16, num_subspaces=8,
                      cap_factor=1.5).train(corpus)
    _, _, idx = s.search(q, topk=10)
    recon = s.reconstruct(np.arange(len(corpus))).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    bf = np.argsort(-(qn @ recon.T), axis=1)[:, :10]
    agree = np.mean([len(set(bf[i]) & set(idx[i])) / 10 for i in range(len(q))])
    assert agree >= 0.85, f"scan vs brute-force agreement {agree}"
    # residual coding reconstructs better than plain PQ at equal code size
    from recommendflow_tpu.retrieval.searcher import PqSearcher
    pq = PqSearcher(32, "cos", num_subspaces=8).train(corpus)
    vn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    err_ivfpq = np.linalg.norm(recon - vn)
    err_pq = np.linalg.norm(pq.reconstruct(np.arange(len(corpus))) - vn)
    assert err_ivfpq < err_pq


def test_ivfpq_l2_distances(ivfpq_world):
    """L2 scores are real distances computed against the reconstruction."""
    from recommendflow_tpu.retrieval.searcher import IvfPqSearcher
    corpus, q = ivfpq_world
    s = IvfPqSearcher(32, "l2", nlist=16, nprobe=16, num_subspaces=8).train(corpus)
    d, idx = s.search(q[:8], topk=5, return_items=False)
    recon = s.reconstruct(idx.reshape(-1)).reshape(8, 5, 32)
    want = np.linalg.norm(q[:8, None, :] - recon, axis=-1)
    np.testing.assert_allclose(d, want, rtol=5e-2, atol=5e-2)


def test_ivfpq_add_extends_without_retrain(ivfpq_world):
    from recommendflow_tpu.retrieval.searcher import IvfPqSearcher
    corpus, _ = ivfpq_world
    s = IvfPqSearcher(32, "cos", nlist=16, nprobe=16,
                      num_subspaces=16).train(corpus[:3000])
    cb_before = np.asarray(s._codebooks).copy()
    s.add(corpus[3000:])
    assert s.num_items == 4000
    np.testing.assert_array_equal(np.asarray(s._codebooks), cb_before)
    # an added item is retrievable by self-query (16-byte codes: measured
    # self-in-top10 = 1.0 on this world)
    probe = corpus[3500]
    _, _, idx = s.search(probe, topk=10)
    assert 3500 in idx[0]


def test_ivfpq_save_load_pickle(tmp_path, ivfpq_world):
    import pickle
    from recommendflow_tpu.retrieval.searcher import IvfPqSearcher
    corpus, q = ivfpq_world
    s = IvfPqSearcher(32, "cos", nlist=16, nprobe=4, num_subspaces=8,
                      query_block=128, seed=3).train(corpus)
    _, _, before = s.search(q[:8], topk=5)
    p = str(tmp_path / "ivfpq.npz")
    s.save(p)
    loaded = IvfPqSearcher.load(p)
    assert (loaded.nprobe, loaded.query_block, loaded.seed) == (4, 128, 3)
    _, _, after = loaded.search(q[:8], topk=5)
    np.testing.assert_array_equal(before, after)
    unpickled = pickle.loads(pickle.dumps(s))
    _, _, after2 = unpickled.search(q[:8], topk=5)
    np.testing.assert_array_equal(before, after2)
    np.testing.assert_allclose(unpickled.reconstruct([5]), s.reconstruct([5]),
                               rtol=1e-6)


# ---------------------------------------------------------------------- SQ
def test_sq8_near_exact_recall():
    from recommendflow_tpu.retrieval.searcher import SqSearcher
    rng = np.random.RandomState(4)
    vecs = rng.randn(3000, 24).astype(np.float32)
    q = rng.randn(32, 24).astype(np.float32)
    exact = TpuSearcher(24, "cos").train(vecs)
    sq = index_factory(24, "SQ8", "cos", item_block=512)
    assert isinstance(sq, SqSearcher) and sq.qtype == "sq8"
    sq.train(vecs)
    _, _, eidx = exact.search(q, topk=10)
    _, _, sidx = sq.search(q, topk=10)
    rec = np.mean([len(set(a) & set(b)) / 10.0 for a, b in zip(eidx, sidx)])
    assert rec >= 0.9, f"SQ8 recall@10 vs exact {rec}"
    # reconstruction error bounded by half a quantization step per dim
    recon = sq.reconstruct(np.arange(100))
    vn = vecs[:100] / np.linalg.norm(vecs[:100], axis=1, keepdims=True)
    step = np.asarray(sq._scale)
    assert np.all(np.abs(recon - vn) <= 0.51 * step[None, :] + 1e-6)


def test_sq_bf16_and_l2(tmp_path):
    import pickle
    from recommendflow_tpu.retrieval.searcher import SqSearcher
    rng = np.random.RandomState(5)
    vecs = rng.randn(1500, 16).astype(np.float32)
    q = rng.randn(16, 16).astype(np.float32)
    bf = index_factory(16, "SQfp16", "l2", item_block=512)
    assert isinstance(bf, SqSearcher) and bf.qtype == "bf16"
    bf.train(vecs)
    d, idx = bf.search(q, topk=5, return_items=False)
    # distances are real L2 against the bf16-rounded corpus
    want = np.linalg.norm(q[:, None, :] - bf.reconstruct(idx.reshape(-1))
                          .reshape(16, 5, 16), axis=-1)
    np.testing.assert_allclose(d, want, rtol=1e-2, atol=1e-2)
    exact = TpuSearcher(16, "l2").train(vecs)
    _, _, eidx = exact.search(q, topk=5)
    rec = np.mean([len(set(a) & set(b)) / 5.0 for a, b in zip(eidx, idx)])
    assert rec >= 0.9

    # persistence round-trips
    p = str(tmp_path / "sq.npz")
    bf.save(p)
    loaded = SqSearcher.load(p)
    d2, idx2 = loaded.search(q, topk=5, return_items=False)
    np.testing.assert_array_equal(idx2, idx)
    unpickled = pickle.loads(pickle.dumps(bf))
    _, idx3 = unpickled.search(q, topk=5, return_items=False)
    np.testing.assert_array_equal(idx3, idx)


def test_sq8_add_frozen_quantizer(tmp_path):
    """FAISS SQ add semantics: the quantizer is fit at train() and FROZEN —
    adds never re-encode existing codes (re-fitting the grid each add would
    compound rounding error over repeated adds), and out-of-range values
    clip to the trained range."""
    import pickle
    from recommendflow_tpu.retrieval.searcher import SqSearcher
    rng = np.random.RandomState(6)
    a = rng.randn(800, 8).astype(np.float32)
    # l2: self-retrieval is norm-safe (ip can prefer larger-norm neighbors)
    sq = SqSearcher(8, "l2", qtype="sq8", item_block=256).train(a)
    codes_before = np.asarray(sq._codes)[:800].copy()
    vmin_before = np.asarray(sq._vmin).copy()

    b = rng.randn(200, 8).astype(np.float32)         # in-range rows
    sq.add(b)
    assert sq.num_items == 1000
    # existing codes and the quantizer are untouched (no drift across adds)
    np.testing.assert_array_equal(np.asarray(sq._codes)[:800], codes_before)
    np.testing.assert_array_equal(np.asarray(sq._vmin), vmin_before)
    step = np.asarray(sq._scale)
    recon = sq.reconstruct(np.arange(800, 1000))
    # values beyond the trained range clip; in-range error <= half a step
    target = np.clip(b, vmin_before, vmin_before + 255.0 * step)
    assert np.all(np.abs(recon - target) <= 0.51 * step[None, :] + 1e-6)
    _, _, idx = sq.search(b[:4], topk=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(800, 804))

    # out-of-range rows clip to the trained range
    big = np.full((1, 8), 100.0, np.float32)
    sq.add(big)
    clipped = sq.reconstruct([1000])
    vmax = vmin_before + 255.0 * step
    np.testing.assert_allclose(clipped[0], vmax, rtol=1e-5)

    # 1-D input raises (not silently broadcast), matching train()
    with pytest.raises(ValueError):
        sq.add(a[0])
    # sq8 pickle round-trip keeps the quantizer; scalar reconstruct works
    up = pickle.loads(pickle.dumps(sq))
    np.testing.assert_allclose(up.reconstruct(0), sq.reconstruct([0]))


def test_ivfpq_add_rejects_1d_and_scalar_reconstruct(ivfpq_world):
    """add() validates shape like train() (a 1-D vector would silently
    broadcast into dim duplicate items); reconstruct accepts a scalar key
    (FAISS parity) instead of returning a mis-shaped array."""
    from recommendflow_tpu.retrieval.searcher import IvfPqSearcher, PqSearcher
    corpus, _ = ivfpq_world
    s = IvfPqSearcher(32, "cos", nlist=16, nprobe=4,
                      num_subspaces=8).train(corpus[:1000])
    with pytest.raises(ValueError):
        s.add(corpus[0])
    one = s.reconstruct(5)
    np.testing.assert_array_equal(one, s.reconstruct([5]))
    assert one.shape == (1, 32)
    pq = PqSearcher(32, "cos", num_subspaces=8).train(corpus[:1000])
    np.testing.assert_array_equal(pq.reconstruct(5), pq.reconstruct([5]))
