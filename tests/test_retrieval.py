"""Retrieval engine tests: exact top-k vs numpy argsort, metric math,
whitening, persistence."""
import numpy as np
import pytest

from recommendflow_tpu.retrieval import (
    TpuSearcher, VecsWhitening, click_ranks, hit_at_k, mrr_at_k, ndcg_at_k,
    recall_metrics, recall_report,
)
from recommendflow_tpu.retrieval.eval import MISS, batch_compute_group_recall_score
from recommendflow_tpu.train.metrics import (
    average_precision, recall_at_precision, roc_auc, spearman,
)


def _corpus(n=1000, d=32, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, d).astype(np.float32)
    return v


@pytest.mark.parametrize("metric", ["ip", "cos", "l2"])
def test_searcher_matches_numpy(metric):
    v = _corpus(500, 16)
    q = _corpus(40, 16, seed=1)
    s = TpuSearcher(dim=16, metric=metric, pad_multiple=128).train(v)
    items, scores, idx = s.search(q, topk=10)
    vv = v / np.linalg.norm(v, axis=1, keepdims=True) if metric == "cos" else v
    qq = q / np.linalg.norm(q, axis=1, keepdims=True) if metric == "cos" else q
    if metric == "l2":
        d2 = ((qq[:, None, :] - vv[None, :, :]) ** 2).sum(-1)
        golden = np.argsort(d2, axis=1)[:, :10]
        # distances ascend
        got_d = np.take_along_axis(np.sqrt(d2), idx, axis=1)
        np.testing.assert_allclose(np.asarray(scores), got_d, rtol=1e-3, atol=1e-3)
    else:
        sim = qq @ vv.T
        golden = np.argsort(-sim, axis=1)[:, :10]
    # compare score sets (ties may permute indices)
    for i in range(len(q)):
        assert set(idx[i]) == set(golden[i]), f"row {i} differs under {metric}"


def test_searcher_topk_list_and_padding():
    v = _corpus(300, 8)
    s = TpuSearcher(dim=8, metric="ip", pad_multiple=256).train(v)  # 300 -> pad 512
    items, scores, idx = s.search(_corpus(5, 8, seed=2), topk=[5, 20])
    assert set(items.keys()) == {5, 20}
    assert items[5].shape == (5, 5) and items[20].shape == (5, 20)
    assert (idx[20] < 300).all()  # padded rows never returned


def test_searcher_pickle_roundtrip(tmp_path):
    v = _corpus(200, 8)
    s = TpuSearcher(dim=8, metric="cos").train(v, items=np.arange(200) + 1000)
    path = str(tmp_path / "s.pkl")
    s.dump(path)
    s2 = TpuSearcher.load_pickle(path)
    q = _corpus(3, 8, seed=3)
    i1, sc1, _ = s.search(q, topk=7)
    i2, sc2, _ = s2.search(q, topk=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(sc1, sc2, rtol=1e-5)


def test_searcher_save_load_npz(tmp_path):
    v = _corpus(100, 8)
    s = TpuSearcher(dim=8, metric="ip").train(v)
    path = str(tmp_path / "idx.npz")
    s.save(path)
    s2 = TpuSearcher.load(path)
    q = _corpus(2, 8, seed=4)
    np.testing.assert_array_equal(s.search(q, 5)[2], s2.search(q, 5)[2])


def test_searcher_errors():
    s = TpuSearcher(dim=8)
    with pytest.raises(RuntimeError, match="empty"):
        s.search(np.zeros((1, 8)), 5)
    with pytest.raises(ValueError, match="metric"):
        TpuSearcher(dim=8, metric="hamming")
    with pytest.raises(ValueError, match="expected"):
        TpuSearcher(dim=8).train(np.zeros((10, 4)))


# -------------------------------------------------------------- metric math
def test_click_ranks_and_metrics():
    rec = np.array([[3, 1, 2], [9, 9, 9], [5, 4, 7]])
    labels = np.array([2, 1, 5])
    ranks = click_ranks(rec, labels)
    np.testing.assert_array_equal(ranks, [2, MISS, 0])
    assert hit_at_k(ranks, 3) == pytest.approx(2 / 3)
    assert hit_at_k(ranks, 1) == pytest.approx(1 / 3)
    assert mrr_at_k(ranks, 3) == pytest.approx((1 / 3 + 0 + 1) / 3)
    assert ndcg_at_k(ranks, 3) == pytest.approx((1 / np.log2(4) + 0 + 1) / 3)
    # weights
    w = np.array([1.0, 0.0, 1.0])
    assert hit_at_k(ranks, 3, w) == pytest.approx(1.0)


def test_group_recall():
    v = _corpus(50, 8)
    s = TpuSearcher(dim=8, metric="cos").train(v)
    q = v + 0.01 * _corpus(50, 8, seed=9)  # queries near their own item
    labels = np.arange(50)
    groups = np.array([0] * 25 + [1] * 25)
    overall, per_group = batch_compute_group_recall_score(
        s, q, labels, groups, topk_list=[1, 5])
    assert overall["hit@1"] > 0.9
    assert set(per_group) == {0, 1}
    assert per_group[0]["count"] == 25


def test_offline_metrics():
    y = np.array([1, 0, 1, 0, 1])
    score = np.array([0.9, 0.8, 0.7, 0.3, 0.2])
    # pos x neg pairs: (0.9,0.8)w (0.9,0.3)w (0.7,0.8)l (0.7,0.3)w (0.2,0.8)l
    # (0.2,0.3)l -> 3 wins / 6 pairs
    assert roc_auc(y, score) == pytest.approx(0.5)
    # perfect and inverted orderings
    assert roc_auc([1, 1, 0, 0], [0.9, 0.8, 0.2, 0.1]) == pytest.approx(1.0)
    assert roc_auc([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == pytest.approx(0.0)
    # ties get half credit
    assert roc_auc([1, 0], [0.5, 0.5]) == pytest.approx(0.5)
    ap = average_precision(y, score)
    assert 0 < ap <= 1
    rec, thr = recall_at_precision(y, score, precision_floor=0.6)
    assert rec > 0 and np.isfinite(thr)
    assert spearman([1, 2, 3, 4], [1, 2, 3, 4]) == pytest.approx(1.0)
    assert spearman([1, 2, 3, 4], [4, 3, 2, 1]) == pytest.approx(-1.0)


def test_whitening(tmp_path):
    rng = np.random.RandomState(0)
    # anisotropic cloud
    x = rng.randn(500, 16) @ np.diag(np.linspace(0.1, 5.0, 16)).astype(np.float32)
    w = VecsWhitening().fit(x)
    z = w.transform(x, normalize=False)
    cov = np.cov(z.T)
    np.testing.assert_allclose(np.diag(cov), 1.0, atol=0.15)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.15
    # dim reduction + persistence
    w2 = VecsWhitening(n_components=4).fit(x)
    assert w2.transform(x).shape == (500, 4)
    path = str(tmp_path / "w.npz")
    w2.save(path)
    w3 = VecsWhitening.load(path)
    np.testing.assert_allclose(w2.transform(x), w3.transform(x), rtol=1e-5)


def test_report_format():
    m = recall_metrics(np.array([0, 1, MISS]), topk_list=[1, 5])
    text = recall_report(m, topk_list=[1, 5])
    assert "hit" in text and "ndcg" in text


def test_group_max_pruned_topk_is_exact():
    """Large corpora route through group-max pruning; verify it equals the
    direct full top-k on identical scores."""
    rng = np.random.RandomState(5)
    n, d, k = 300_000, 32, 37
    corpus = rng.randn(n, d).astype(np.float32)
    s = TpuSearcher(dim=d, metric="ip").train(corpus)
    assert s._vecs.shape[0] % 65536 == 0  # large-corpus padding engaged
    q = rng.randn(40, d).astype(np.float32)
    _, scores, idx = s.search(q, topk=k)
    import jax.numpy as jnp
    import jax
    golden_scores = np.asarray(q @ corpus.T)
    gs, gi = jax.lax.top_k(jnp.asarray(golden_scores), k)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(gs),
                               rtol=1e-5, atol=1e-5)
    # index sets equal row-wise (ties may permute)
    for r in range(40):
        assert set(np.asarray(idx)[r]) == set(np.asarray(gi)[r])


def test_add_appends_not_replaces():
    v1 = _corpus(100, 8, seed=1)
    v2 = _corpus(50, 8, seed=2)
    s = TpuSearcher(dim=8, metric="cos").train(v1)
    s.add(v2)
    assert s.num_items == 150
    # under cosine, a query equal to a v2 row retrieves itself (sim = 1)
    _, _, idx = s.search(v2[:5], topk=1)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(100, 105))


@pytest.mark.parametrize("metric", ["ip", "cos", "l2"])
def test_hierarchical_tournament_is_exact(metric, monkeypatch):
    """Force the two-level tournament + vector-rescore path on a small corpus
    and verify it returns exactly the brute-force top-k (scores and index
    sets) for every metric."""
    import recommendflow_tpu.retrieval._kernels as S
    monkeypatch.setattr(S, "_HIER_MIN_ITEMS", 1024)
    n, d, k = 20000, 16, 12   # pads to 20480 -> 80 supergroups (> 64 guard)
    v = _corpus(n, d, seed=3)
    q = _corpus(30, d, seed=4)
    s = TpuSearcher(dim=d, metric=metric, pad_multiple=512).train(v)
    n_pad = int(s._vecs.shape[0])
    assert n_pad % (S._GROUP * S._SUPERGROUP) == 0
    assert n_pad // (S._GROUP * S._SUPERGROUP) > max(k, 64)
    items, scores, idx = s.search(q, topk=k)
    assert s._vecs_g is not None  # hierarchical path engaged

    vv = v / np.linalg.norm(v, axis=1, keepdims=True) if metric == "cos" else v
    qq = q / np.linalg.norm(q, axis=1, keepdims=True) if metric == "cos" else q
    if metric == "l2":
        d2 = ((qq[:, None, :] - vv[None, :, :]) ** 2).sum(-1)
        golden_idx = np.argsort(d2, axis=1)[:, :k]
        golden_scores = np.sqrt(np.take_along_axis(d2, golden_idx, axis=1))
    else:
        sim = qq @ vv.T
        golden_idx = np.argsort(-sim, axis=1)[:, :k]
        golden_scores = np.take_along_axis(sim, golden_idx, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(scores), axis=1),
                               np.sort(golden_scores, axis=1),
                               rtol=1e-4, atol=1e-4)
    for r in range(len(q)):
        assert set(np.asarray(idx)[r]) == set(golden_idx[r])


@pytest.mark.parametrize("metric", ["ip", "cos", "l2"])
def test_sharded_searcher_matches_single_device(metric):
    """ShardedSearcher (corpus row-sharded over the 8 fake devices, SPMD
    tournament + cross-shard merge) must return exactly the single-device
    searcher's top-k, including the traced valid-boundary masking on the
    last shard."""
    import jax
    from recommendflow_tpu.retrieval import ShardedSearcher
    n, d, k = 3777, 16, 9          # deliberately not a multiple of anything
    v = _corpus(n, d, seed=8)
    q = _corpus(25, d, seed=9)
    single = TpuSearcher(dim=d, metric=metric, pad_multiple=128).train(v)
    sharded = ShardedSearcher(dim=d, metric=metric).train(v)
    assert len(sharded.mesh.devices.ravel()) == len(jax.devices())
    _, s1, i1 = single.search(q, topk=k)
    _, s2, i2 = sharded.search(q, topk=k)
    np.testing.assert_allclose(np.sort(np.asarray(s2), axis=1),
                               np.sort(np.asarray(s1), axis=1),
                               rtol=1e-4, atol=1e-4)
    for r in range(len(q)):
        assert set(np.asarray(i2)[r]) == set(np.asarray(i1)[r])


def test_sharded_searcher_hier_local_path(monkeypatch):
    """Force per-shard corpora large enough for the local hierarchical path
    (n_local=512*... needs n_sg>64 -> n_local>16384) and check exactness."""
    from recommendflow_tpu.retrieval import ShardedSearcher
    n, d, k = 140_000, 16, 7       # 8 shards x 17920 local -> n_sg=70 > 64
    rng = np.random.RandomState(11)
    v = rng.randn(n, d).astype(np.float32)
    q = rng.randn(10, d).astype(np.float32)
    sharded = ShardedSearcher(dim=d, metric="ip").train(v)
    _, s2, i2 = sharded.search(q, topk=k)
    golden = np.argsort(-(q @ v.T), axis=1)[:, :k]
    for r in range(len(q)):
        assert set(np.asarray(i2)[r]) == set(golden[r])


def test_sharded_boundary_group_cannot_displace_topk():
    """Adversarial case for the traced-boundary over-inclusion: every true
    top-k item planted in a DISTINCT supergroup of the boundary shard. The
    +BIG boundary group must widen the tournament selection (select_k=k+1),
    not consume one of the k slots — with exactly k slots the true k-th
    group gets dropped (regression: review finding, sharded.py)."""
    import jax
    from recommendflow_tpu.retrieval import ShardedSearcher
    n_dev = len(jax.devices())
    n, d, k = 260_000, 16, 80
    rng = np.random.RandomState(3)
    v = rng.randn(n, d).astype(np.float32) * 0.01
    q = rng.randn(1, d).astype(np.float32)
    qn = (q / np.linalg.norm(q))[0]
    sharded = ShardedSearcher(dim=d, metric="ip").train(v)
    n_local = int(sharded._vecs.shape[0]) // n_dev
    # the LAST shard holds the valid-boundary; plant each top item in its
    # own supergroup there
    offset = (n_dev - 1) * n_local
    assert offset < n, "corpus must straddle the last shard"
    for j in range(k):
        v[offset + j * 256] = qn * (10.0 + j)
    sharded.train(v)  # re-upload with the planted rows
    assert sharded._search_fn is None
    _, scores, idx = sharded.search(q, topk=k)
    exact = set(np.argsort(-(v @ q[0]))[:k].tolist())
    assert set(np.asarray(idx)[0].tolist()) == exact


def test_sharded_searcher_pickle_roundtrip(tmp_path):
    """dump/load_pickle parity (faiss_searcher.py:217-225): jax Device
    handles must not leak into the pickle; the restored searcher rebuilds
    on the current mesh and returns identical results."""
    from recommendflow_tpu.retrieval import ShardedSearcher
    v = _corpus(3000, 16, seed=4)
    q = _corpus(7, 16, seed=5)
    s = ShardedSearcher(dim=16, metric="cos").train(v)
    _, sc1, i1 = s.search(q, topk=10)
    s.dump(str(tmp_path / "sharded.pkl"))
    s2 = ShardedSearcher.load_pickle(str(tmp_path / "sharded.pkl"))
    _, sc2, i2 = s2.search(q, topk=10)
    np.testing.assert_allclose(np.asarray(sc2), np.asarray(sc1),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(i2), np.asarray(i1))


@pytest.mark.parametrize("qtype,metric", [
    ("bf16", "ip"), ("bf16", "cos"), ("bf16", "l2"),
    ("sq8", "cos"), ("sq8", "l2"),
])
def test_sharded_sq_matches_single_device(qtype, metric):
    """ShardedSqSearcher row-shards the quantized codes over the mesh; the
    per-item surrogate scores are computed by the same formula/dtype path
    as the single-device SqSearcher, so the merged top-k must agree (ties
    break by lowest global index in both)."""
    from recommendflow_tpu.retrieval import ShardedSqSearcher
    from recommendflow_tpu.retrieval.searcher import SqSearcher
    n, d, k = 3777, 16, 9
    v = _corpus(n, d, seed=21)
    q = _corpus(25, d, seed=22)
    single = SqSearcher(dim=d, metric=metric, qtype=qtype).train(v)
    sharded = ShardedSqSearcher(dim=d, metric=metric, qtype=qtype).train(v)
    _, s1, i1 = single.search(q, topk=k)
    _, s2, i2 = sharded.search(q, topk=k)
    np.testing.assert_allclose(np.sort(np.asarray(s2), axis=1),
                               np.sort(np.asarray(s1), axis=1),
                               rtol=1e-4, atol=1e-4)
    for r in range(len(q)):
        assert len(set(np.asarray(i2)[r]) & set(np.asarray(i1)[r])) >= k - 1


def test_sharded_sq_hier_local_path():
    """Per-shard corpora large enough for the local grouped tournament
    (n_local > 16384): the sharded bf16 search must recover the top-k of
    the dequantized corpus (exact selection over quantized scores; the
    boundary shard straddles num_items)."""
    from recommendflow_tpu.retrieval import ShardedSqSearcher
    n, d, k = 140_000, 16, 7
    rng = np.random.RandomState(31)
    v = rng.randn(n, d).astype(np.float32)
    q = rng.randn(10, d).astype(np.float32)
    sharded = ShardedSqSearcher(dim=d, metric="ip", qtype="bf16").train(v)
    n_dev = sharded.mesh.devices.size
    n_local = int(sharded._codes.shape[0]) // n_dev
    assert n_local // (16 * 16) > 64, "test must exercise the hier path"
    _, i2 = sharded.search(q, topk=k, return_items=False)
    vq = sharded.reconstruct(np.arange(n))          # dequantized corpus
    golden = np.argsort(-(q.astype(np.float64) @ vq.astype(np.float64).T),
                        axis=1)[:, :k]
    for r in range(len(q)):
        assert len(set(np.asarray(i2)[r]) & set(golden[r])) >= k - 1


def test_sharded_sq_add_and_pickle(tmp_path):
    """add() extends with the frozen quantizer across the sharded layout;
    pickling drops Device handles and restores on the current mesh."""
    from recommendflow_tpu.retrieval import ShardedSqSearcher
    v = _corpus(2000, 16, seed=41)
    extra = _corpus(500, 16, seed=42)
    q = _corpus(5, 16, seed=43)
    s = ShardedSqSearcher(dim=16, metric="cos", qtype="sq8").train(v)
    s.add(extra)
    assert s.num_items == 2500
    _, sc1, i1 = s.search(q, topk=8)
    s.dump(str(tmp_path / "ssq.pkl"))
    s2 = ShardedSqSearcher.load_pickle(str(tmp_path / "ssq.pkl"))
    _, sc2, i2 = s2.search(q, topk=8)
    np.testing.assert_allclose(np.asarray(sc2), np.asarray(sc1),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(i2), np.asarray(i1))


def test_sharded_searchers_on_multi_axis_mesh():
    """Shard count must come from the 'items' axis size, not the total
    device count: on a 2x4 ('x','items') mesh the scan shards 4-way and
    replicates over 'x' (regression: review finding — deriving n_local
    from devices.size scanned half of every shard and offset wrongly)."""
    import jax
    from jax.sharding import Mesh
    from recommendflow_tpu.retrieval import (
        ShardedSearcher, ShardedSqSearcher)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("x", "items"))
    n, d, k = 5000, 16, 5
    v = _corpus(n, d, seed=51)
    q = _corpus(8, d, seed=52)
    golden = np.argsort(-(q @ v.T), axis=1)[:, :k]
    s = ShardedSearcher(dim=d, metric="ip", mesh=mesh).train(v)
    _, i1 = s.search(q, topk=k, return_items=False)
    for r in range(len(q)):
        assert set(np.asarray(i1)[r]) == set(golden[r])
    sq = ShardedSqSearcher(dim=d, metric="ip", qtype="bf16",
                           mesh=mesh).train(v)
    _, i2 = sq.search(q, topk=k, return_items=False)
    for r in range(len(q)):
        assert len(set(np.asarray(i2)[r]) & set(golden[r])) >= k - 1
    with pytest.raises(ValueError, match="items"):
        ShardedSearcher(dim=d, mesh=Mesh(devs, ("a", "b")))


def test_index_factory_mesh_routing():
    """index_factory(mesh=...) routes Flat -> ShardedSearcher and SQ* ->
    ShardedSqSearcher; IVF/PQ reject the mesh."""
    import jax
    from jax.sharding import Mesh
    from recommendflow_tpu.retrieval import (
        ShardedSearcher, ShardedSqSearcher, index_factory)
    mesh = Mesh(np.asarray(jax.devices()), ("items",))
    assert isinstance(index_factory(8, "Flat", mesh=mesh), ShardedSearcher)
    s = index_factory(8, "SQbf16", "ip", mesh=mesh)
    assert isinstance(s, ShardedSqSearcher) and s.qtype == "bf16"
    assert index_factory(8, "SQ8", mesh=mesh).qtype == "sq8"
    with pytest.raises(ValueError, match="mesh"):
        index_factory(8, "IVF16,Flat", mesh=mesh)


# ---------------------------------------------------- metric edge regressions
def test_metrics_binarize_and_handle_ties():
    """average_precision/recall_at_precision binarize labels like roc_auc;
    spearman averages tied ranks; the returned recall@precision threshold
    is ACHIEVABLE under `score >= t` despite ties (regression: review
    findings)."""
    # weighted labels must not produce AP > 1
    ap = average_precision(np.array([2.0, 0.0]), np.array([0.9, 0.1]))
    assert ap == 1.0
    # tied-rank spearman == scipy semantics
    s = spearman(np.array([1.0, 1.0, 2.0]), np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(s, 0.8660254, rtol=1e-5)
    # permutation invariance under ties
    s2 = spearman(np.array([1.0, 1.0, 2.0]), np.array([2.0, 1.0, 3.0]))
    np.testing.assert_allclose(s, s2, rtol=1e-6)
    # tied scores: the threshold must not admit extra rows that break the floor
    rec, thr = recall_at_precision(np.array([1.0, 0.0]),
                                   np.array([0.9, 0.9]), 0.6)
    sel = np.array([0.9, 0.9]) >= thr
    y = np.array([1.0, 0.0])
    if sel.any():
        assert y[sel].mean() >= 0.6 or rec == 0.0


# ---------------------------------------------------------------- metrics
class TestDistanceMetrics:
    """The reference's full 9-metric surface (faiss_searcher.py:81-97),
    oracle-checked against scipy cdist / the FAISS formulas."""

    @pytest.mark.parametrize("metric,cdist_name", [
        ("l1", "cityblock"), ("l_inf", "chebyshev"),
        ("brayCurtis", "braycurtis"), ("canberra", "canberra"),
    ])
    def test_matches_scipy(self, metric, cdist_name):
        from scipy.spatial.distance import cdist
        from recommendflow_tpu.retrieval import TpuSearcher
        rng = np.random.RandomState(0)
        corpus = rng.rand(700, 24).astype(np.float32) + 0.1
        queries = rng.rand(9, 24).astype(np.float32) + 0.1
        s = TpuSearcher(24, metric).train(corpus)
        _, dists, idx = s.search(queries, topk=5)
        ref = cdist(queries, corpus, cdist_name)
        ref_idx = np.argsort(ref, axis=1, kind="stable")[:, :5]
        ref_d = np.take_along_axis(ref, ref_idx, axis=1)
        np.testing.assert_allclose(np.asarray(dists), ref_d,
                                   rtol=1e-4, atol=1e-5)
        # ordering (ties possible only at float noise — compare via dist)
        got_d = np.take_along_axis(ref, np.asarray(idx), axis=1)
        np.testing.assert_allclose(got_d, ref_d, rtol=1e-4, atol=1e-5)

    def test_lp_is_unrooted_faiss_formula(self):
        from recommendflow_tpu.retrieval import TpuSearcher
        rng = np.random.RandomState(1)
        corpus = rng.randn(300, 8).astype(np.float32)
        q = rng.randn(4, 8).astype(np.float32)
        s = TpuSearcher(8, "l_p", metric_arg=3.0).train(corpus)
        _, dists, idx = s.search(q, topk=3)
        ref = (np.abs(q[:, None, :] - corpus[None]) ** 3.0).sum(-1)
        ref_d = np.sort(ref, axis=1)[:, :3]
        np.testing.assert_allclose(np.asarray(dists), ref_d, rtol=1e-4)

    def test_jensen_shannon_divergence(self):
        from recommendflow_tpu.retrieval import TpuSearcher
        rng = np.random.RandomState(2)
        corpus = rng.rand(200, 16).astype(np.float32) + 1e-3
        q = rng.rand(3, 16).astype(np.float32) + 1e-3
        s = TpuSearcher(16, "jensen_shannon").train(corpus)
        _, dists, _ = s.search(q, topk=4)
        x, y = q[:, None, :], corpus[None]
        m = 0.5 * (x + y)
        ref = 0.5 * (x * np.log(x / m) + y * np.log(y / m)).sum(-1)
        ref_d = np.sort(ref, axis=1)[:, :4]
        np.testing.assert_allclose(np.asarray(dists), ref_d,
                                   rtol=1e-4, atol=1e-6)

    def test_int_metric_passthrough(self):
        """FAISS MetricType ints resolve (reference int pass-through,
        faiss_searcher.py:95-96); unknown ints raise."""
        from recommendflow_tpu.retrieval import TpuSearcher, resolve_metric
        assert resolve_metric(0) == "ip" and resolve_metric(1) == "l2"
        assert TpuSearcher(8, metric=2).metric == "l1"
        assert TpuSearcher(8, metric=3).metric == "l_inf"
        with pytest.raises(ValueError, match="unknown FAISS MetricType"):
            TpuSearcher(8, metric=99)

    def test_quantized_reject_distance_metrics(self):
        from recommendflow_tpu.retrieval import IvfSearcher, index_factory
        with pytest.raises(ValueError, match="not in"):
            IvfSearcher(8, "l1", nlist=4)
        with pytest.raises(ValueError, match="not in"):
            index_factory(8, "PQ2", "canberra")
        # Flat accepts the full surface through the factory
        assert index_factory(8, "Flat", "l_inf").metric == "l_inf"


# ---------------------------------------------------- encoder-attached mode
class _ToyEncoder:
    """Deterministic text -> vector: a seeded hash projection."""

    def encode(self, texts, verbose=0):
        out = np.zeros((len(texts), 12), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.RandomState(abs(hash(t)) % (2 ** 31))
            out[i] = rng.randn(12)
        return out


class TestEncoderSearcher:
    def _items(self):
        import pandas as pd
        names = [f"item_{i}" for i in range(50)]
        return pd.DataFrame({"title": names,
                             "cat": [i % 5 for i in range(50)],
                             "price": np.arange(50.0)})

    def test_joined_dataframe_with_rank(self):
        from recommendflow_tpu.retrieval import EncoderSearcher
        s = EncoderSearcher(encoder=_ToyEncoder(), items=self._items(),
                            index_param="Flat", measurement="cos").train()
        df = s.search(["item_3", "item_7"], topK=4, keep_rank_no=True)
        assert list(df.columns[:4]) == ["source_item", "sim_item",
                                        "sim_val", "rank_no"]
        assert {"cat", "price"} <= set(df.columns)  # extra item cols joined
        assert len(df) == 8
        # self-match at rank 0 (deterministic encoder, cos metric)
        top = df[df.rank_no == 0]
        assert list(top.source_item) == list(top.sim_item)
        # without rank_no the column disappears
        df2 = s.search(["item_3"], topK=2)
        assert "rank_no" not in df2.columns

    def test_topk_list_returns_per_k_dict(self):
        from recommendflow_tpu.retrieval import EncoderSearcher
        s = EncoderSearcher(encoder=_ToyEncoder(), items=self._items(),
                            index_param="Flat", measurement="cos").train()
        res = s.search(["item_1"], topK=[2, 5], keep_rank_no=True)
        assert set(res) == {2, 5}
        assert len(res[2]) == 2 and len(res[5]) == 5
        assert (res[2].rank_no < 2).all()

    def test_vector_mode_tuples(self):
        from recommendflow_tpu.retrieval import EncoderSearcher
        rng = np.random.RandomState(0)
        vecs = rng.randn(40, 8).astype(np.float32)
        labels = [f"id{i}" for i in range(40)]
        s = EncoderSearcher(items=vecs, item_list=labels,
                            index_param="Flat", measurement="cos").train()
        ids, sims, idx = s.search(vecs[:3], topK=2, keep_rank_no=True)
        assert ids.shape == (3, 2) and idx[0, 0] == 0
        assert ids[1, 0] == "id1"
        res = s.search(vecs[:3], topK=[1, 2])
        assert res[1][0].shape == (3, 1)

    def test_guardrails(self):
        """Review-finding regressions: a bare-string target wraps into a
        one-element list (not char-by-char encoding); items columns that
        clash with the join's output names raise instead of silently
        corrupting; encoder + ndarray items rejects at construction."""
        import pandas as pd
        from recommendflow_tpu.retrieval import EncoderSearcher
        s = EncoderSearcher(encoder=_ToyEncoder(), items=self._items(),
                            index_param="Flat", measurement="cos").train()
        df = s.search("item_3", topK=2, keep_rank_no=True)
        assert len(df) == 2 and (df.source_item == "item_3").all()
        clash = EncoderSearcher(
            encoder=_ToyEncoder(),
            items=pd.DataFrame({"title": ["a", "b"],
                                "sim_val": [1.0, 2.0]}),
            index_param="Flat", measurement="cos").train()
        with pytest.raises(ValueError, match="sim_val"):
            clash.search(["a"], topK=1)
        with pytest.raises(TypeError, match="DataFrame"):
            EncoderSearcher(encoder=_ToyEncoder(),
                            items=np.zeros((4, 8), np.float32))

    def test_cal_sim_l2_ranks_ascending(self):
        """cal_sim must rank consistently with the searcher's metric (the
        reference always dot-products, contradicting its own l2 searches —
        implemented by intent)."""
        from recommendflow_tpu.retrieval import EncoderSearcher
        s = EncoderSearcher(encoder=_ToyEncoder(), items=self._items(),
                            index_param="Flat", measurement="l2").train()
        sim = s.cal_sim("item_0", ["item_1", "item_0", "item_2"])
        assert sim.iloc[0]["item"] == "item_0"       # zero distance first
        assert sim.iloc[0]["score"] <= sim.iloc[1]["score"]

    def test_cal_sim_and_pickle(self, tmp_path):
        from recommendflow_tpu.retrieval import EncoderSearcher
        s = EncoderSearcher(encoder=_ToyEncoder(), items=self._items(),
                            index_param="Flat", measurement="cos").train()
        sim = s.cal_sim("item_0", ["item_1", "item_0", "item_2"])
        assert sim.iloc[0]["item"] == "item_0"  # self most similar
        p = str(tmp_path / "searcher.pkl")
        s.save_searcher(p)
        s2 = EncoderSearcher.load_searcher(p)
        df = s2.search(["item_3"], topK=3, keep_rank_no=True)
        assert df.iloc[0]["sim_item"] == "item_3"

    def test_untrained_and_bad_encoder_errors(self):
        from recommendflow_tpu.retrieval import EncoderSearcher
        with pytest.raises(AttributeError, match="encode"):
            EncoderSearcher(encoder=object(), items=self._items())
        with pytest.raises(TypeError, match="ndarray"):
            EncoderSearcher(items=self._items())
        s = EncoderSearcher(encoder=_ToyEncoder(), items=self._items())
        with pytest.raises(RuntimeError, match="not trained"):
            s.search(["x"], topK=1)


@pytest.mark.parametrize("qtype", ["sq8", "bf16"])
@pytest.mark.parametrize("metric", ["ip", "cos", "l2"])
def test_sq_grouped_tournament_matches_flat_scan(metric, qtype, monkeypatch):
    """SqSearcher's grouped-tournament path (engaged on big corpora) must
    agree with its flat block scan — same quantized scores, same ids (up to
    bf16-ulp group-max ties)."""
    import recommendflow_tpu.retrieval._kernels as S
    from recommendflow_tpu.retrieval import SqSearcher
    rng = np.random.RandomState(5)
    n, d, k = 20000, 16, 10
    v = rng.randn(n, d).astype(np.float32)
    q = rng.randn(16, d).astype(np.float32)

    monkeypatch.setattr(S, "_HIER_MIN_ITEMS", 1024)
    hier = SqSearcher(dim=d, metric=metric, qtype=qtype,
                      item_block=1024).train(v)
    s_hier, i_hier = hier.search(q, topk=k, return_items=False)
    assert hier._codes_g is not None           # tournament path engaged

    # golden: numpy over the DEQUANTIZED corpus (the searcher's own x-hat)
    vv = v / np.linalg.norm(v, axis=1, keepdims=True) if metric == "cos" else v
    qq = q / np.linalg.norm(q, axis=1, keepdims=True) if metric == "cos" else q
    if qtype == "sq8":
        codes = np.asarray(hier._codes)[:n].astype(np.float32)
        xhat = np.asarray(hier._vmin) + np.asarray(hier._scale) * codes
    else:
        xhat = np.asarray(hier._codes)[:n].astype(np.float32)
    if metric == "l2":
        d2 = ((qq[:, None, :] - xhat[None, :, :]) ** 2).sum(-1)
        g_idx = np.argsort(d2, axis=1)[:, :k]
        g_scores = np.sqrt(np.take_along_axis(d2, g_idx, axis=1))
    else:
        sim = qq @ xhat.T
        g_idx = np.argsort(-sim, axis=1)[:, :k]
        g_scores = np.take_along_axis(sim, g_idx, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(s_hier), axis=1),
                               np.sort(g_scores, axis=1),
                               rtol=1e-4, atol=1e-4)
    for r in range(len(q)):
        assert set(np.asarray(i_hier)[r]) == set(g_idx[r]), f"row {r}"

    # pickle round-trip keeps the lazy grouped state rebuildable
    import pickle
    hier2 = pickle.loads(pickle.dumps(hier))
    s2, i2 = hier2.search(q, topk=k, return_items=False)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_hier),
                               rtol=2e-3, atol=2e-3)


def test_average_precision_tie_invariant():
    """Tied scores are one atomic operating point: the same (label, score)
    multiset must yield the same AP regardless of row order (float32
    sigmoid saturation makes exact ties common)."""
    from recommendflow_tpu.train.metrics import average_precision
    a = average_precision([1, 0], [0.5, 0.5])
    b = average_precision([0, 1], [0.5, 0.5])
    assert a == b == pytest.approx(0.5)
    y, s = [1, 1, 0, 0], [1.0, 1.0, 1.0, 0.0]
    assert average_precision(y, s) == pytest.approx(
        average_precision(y[::-1], s[::-1]))


def test_streaming_auc_degenerate_and_shapes():
    """Single-class streams are NaN (not a 'perfectly inverted' 0.0), and
    [B,1]-shaped outputs ravel instead of broadcasting into garbage."""
    import jax.numpy as jnp
    from recommendflow_tpu.train.metrics import (auc_init, auc_result,
                                                 auc_update)
    st = auc_update(auc_init(50), jnp.zeros((100,)), jnp.linspace(0, 1, 100))
    assert np.isnan(float(auc_result(st)))
    st2 = auc_update(auc_init(50), jnp.ones((4, 1)), 0.5 * jnp.ones((4, 1)))
    st2 = auc_update(st2, jnp.zeros((4, 1)), 0.1 * jnp.ones((4, 1)))
    assert float(auc_result(st2)) > 0.9


def test_zero_weight_group_is_nan_not_warning():
    from recommendflow_tpu.retrieval.eval import hit_at_k
    ranks = np.array([0, 1, 2])
    with np.errstate(all="raise"):  # a 0/0 would raise here
        assert np.isnan(hit_at_k(ranks, 5, weights=np.zeros(3)))
    assert hit_at_k(ranks, 5) == 1.0
