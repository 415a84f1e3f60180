"""Shared retrieval kernels: metric resolution, pairwise distances, the
tournament top-k selector, device k-means, and PQ codebook helpers —
common to every searcher family (split out of searcher.py; the design
rationale and measurements live in the family modules and CLAUDE.md).
"""
from __future__ import annotations

import pickle
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30

# tournament-pruned exact top-k parameters (see _build_search): items are
# max-pooled in groups of _GROUP, group maxima in supergroups of _SUPERGROUP;
# the hierarchical path engages above _HIER_MIN_ITEMS padded items
_GROUP = 16
_SUPERGROUP = 16
_HIER_MIN_ITEMS = 262144


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _to_host(x) -> np.ndarray:
    """Device -> host numpy for corpus/code matrices. In multi-process runs
    a mesh-sharded matrix spans non-addressable devices — plain np.asarray
    raises — so it is allgathered first (tiled: each process contributes its
    rows; same rule train/checkpoint.save_pytree follows). Collective: in a
    multi-process cluster every process must call save/add/reconstruct/
    pickle together, SPMD-style."""
    if (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not x.is_fully_replicated):
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


# distance metrics beyond the matmul family (smaller = better; search()
# returns them ascending, FAISS-style). Parity: the reference's 9-metric map
# faiss_searcher.py:81-97.
_DISTANCE_METRICS = ("l1", "l_inf", "l_p", "brayCurtis", "canberra",
                     "jensen_shannon")
# FAISS MetricType enum values -> names (the reference passes raw ints
# through to faiss, faiss_searcher.py:95-96)
_FAISS_METRIC_INTS = {0: "ip", 1: "l2", 2: "l1", 3: "l_inf", 4: "l_p",
                      20: "canberra", 21: "brayCurtis", 22: "jensen_shannon"}


def resolve_metric(measurement: Union[str, int]) -> str:
    """Accept a metric name or a raw FAISS MetricType int (reference
    int pass-through parity, faiss_searcher.py:95-96)."""
    if isinstance(measurement, (int, np.integer)):
        if int(measurement) not in _FAISS_METRIC_INTS:
            raise ValueError(
                f"unknown FAISS MetricType int {measurement}; known: "
                f"{_FAISS_METRIC_INTS}")
        return _FAISS_METRIC_INTS[int(measurement)]
    return str(measurement)


def _make_pairwise_distance(metric: str, p: float):
    """[Q, D] x [Nb, D] -> [Q, Nb] distance block (FAISS formula parity:
    Lp is sum|x-y|^p WITHOUT the 1/p root; Canberra skips zero-denominator
    terms; JensenShannon assumes non-negative inputs and guards zeros)."""
    def dist(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        diff = jnp.abs(q[:, None, :] - v[None, :, :])
        if metric == "l1":
            return jnp.sum(diff, -1)
        if metric == "l_inf":
            return jnp.max(diff, -1)
        if metric == "l_p":
            return jnp.sum(diff ** p, -1)
        if metric == "brayCurtis":
            den = jnp.sum(jnp.abs(q[:, None, :] + v[None, :, :]), -1)
            return jnp.sum(diff, -1) / jnp.maximum(den, 1e-20)
        if metric == "canberra":
            den = jnp.abs(q)[:, None, :] + jnp.abs(v)[None, :, :]
            return jnp.sum(jnp.where(den > 0,
                                     diff / jnp.maximum(den, 1e-20), 0.0), -1)
        if metric == "jensen_shannon":
            x, y = q[:, None, :], v[None, :, :]
            m = jnp.maximum(0.5 * (x + y), 1e-20)
            t1 = jnp.where(x > 0, x * jnp.log(jnp.maximum(x, 1e-20) / m), 0.0)
            t2 = jnp.where(y > 0, y * jnp.log(jnp.maximum(y, 1e-20) / m), 0.0)
            return 0.5 * jnp.sum(t1 + t2, -1)
        raise ValueError(f"not a distance metric: {metric}")
    return dist


def _tournament_select(queries, m1, vecs_g, sqn_g, k, select_k, valid,
                       metric, base=None):
    """Two-level tournament select + exact vector rescore.

    m1      [Q, n_groups] per-group score maxima (masked by the caller).
    vecs_g  [n_groups, G, D] grouped corpus relayout; sqn_g [n_groups, G]
            squared norms (l2 only). valid: item indices >= valid score NEG
            at rescore (may be a traced scalar).
    select_k >= k supergroups/groups survive each tournament level — callers
    that force an over-included candidate group (e.g. a traced-boundary
    group pinned to +BIG, see sharded.py) pass select_k = k + 1 so the
    forced group cannot displace a true top-k group from the k slots.

    Exactness: at most k groups can contain a top-k element and each such
    group's max is >= the k-th best score, so the top-select_k(>=k)
    groups-by-max cover every top-k element — at any nesting depth. Full
    scores for the winning groups are RE-COMPUTED from gathered group
    vectors (FLAT index into the 3D group table: [1, G, D] tile gathers run
    ~2x faster than [1, G*D] wide rows — 6.2 vs 12.8 ms per 102k gathers
    from 1M x 128, measured v5e) instead of gathered out of a materialized
    [Q, N] score matrix. take_along_axis with [:, :, None] indices lowers
    to cheap row gathers; flat per-element indexing costs ~30 ns/element.
    """
    nq = queries.shape[0]
    G2 = _SUPERGROUP
    G, dim = vecs_g.shape[1], vecs_g.shape[2]
    n_sg = m1.shape[1] // G2
    m2 = jnp.max(m1.reshape(nq, n_sg, G2), axis=-1)
    _, sg = jax.lax.top_k(m2, select_k)               # [Q, sk] supergroups
    c1 = jnp.take_along_axis(m1.reshape(nq, n_sg, G2),
                             sg[:, :, None], axis=1)
    _, pos = jax.lax.top_k(c1.reshape(nq, select_k * G2), select_k)
    gids = (sg[:, :, None] * G2 +
            jnp.arange(G2)[None, None, :]).reshape(nq, select_k * G2)
    gidx = jnp.take_along_axis(gids, pos, axis=1)     # [Q, sk] groups
    gv = vecs_g[gidx.reshape(-1)].reshape(nq, select_k, G, dim)
    # vecs_g may hold quantized codes (SqSearcher): cast to the query dtype
    # and add the caller's per-query affine base (q·vmin for SQ8)
    cs = jnp.einsum("qkgd,qd->qkg", gv.astype(queries.dtype), queries)
    if base is not None:
        cs = cs + base[:, None, None]
    cand = (gidx[:, :, None] * G +
            jnp.arange(G)[None, None, :]).reshape(nq, select_k * G)
    if metric == "l2":
        cs = 2.0 * cs - sqn_g[gidx.reshape(-1)].reshape(nq, select_k, G)
    cs = jnp.where(cand.reshape(nq, select_k, G) < valid,
                   cs, NEG).reshape(nq, select_k * G)
    top_scores, p2 = jax.lax.top_k(cs, k)
    return top_scores, jnp.take_along_axis(cand, p2, axis=1)




# ------------------------------------------------------------------ k-means
def kmeans(vectors: jnp.ndarray, nlist: int, iters: int = 10,
           seed: int = 0, spherical: bool = False) -> jnp.ndarray:
    """Lloyd's k-means on device: assignment is [block, D] x [D, C] MXU
    matmuls per iteration (row-blocked scan — a monolithic [N, C] score
    matrix is 16 GB at N=1M, C=4096 and OOMs one chip), the update an
    accumulated segment-sum. Returns [nlist, D] centroids. spherical=True
    renormalizes centroids every step (cos/ip)."""
    n, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (nlist,), replace=n < nlist)
    centroids = vectors[init_idx]
    # bound the per-block [block, C] score temp to ~256 MB f32
    block = max(256, min(n, (1 << 26) // max(nlist, 1)))
    nb = -(-n // block)
    n_pad = nb * block

    # vectors MUST be a jit argument, not a closure capture: captured device
    # arrays are baked into the executable as constants and re-uploaded at
    # compile time (measured: 128 MB constant -> 7.5 s/step over the tunnel)
    @jax.jit
    def step(x, c):
        c_sq = jnp.sum(c * c, axis=1)
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))

        def body(carry, start):
            sums, counts = carry
            xb = jax.lax.dynamic_slice(xp, (start, 0), (block, d))
            # nearest centroid in L2: argmin ||x||^2 - 2 x·c + ||c||^2
            a = jnp.argmax(2.0 * (xb @ c.T) - c_sq[None, :], axis=1)
            w = ((start + jnp.arange(block)) < n).astype(jnp.float32)
            sums = sums + jax.ops.segment_sum(xb * w[:, None], a,
                                              num_segments=nlist)
            counts = counts + jax.ops.segment_sum(w, a,
                                                  num_segments=nlist)
            return (sums, counts), None

        init = (jnp.zeros((nlist, d), jnp.float32),
                jnp.zeros((nlist,), jnp.float32))
        (sums, counts), _ = jax.lax.scan(
            body, init, jnp.arange(nb, dtype=jnp.int32) * block)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where(counts[:, None] > 0, new, c)             # keep empties
        if spherical:
            new = new / jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        return new

    for _ in range(iters):
        centroids = step(vectors, centroids)
    return centroids


# ------------------------------------------------------- shared IVF/PQ tools
def _assign_blocks(padded_vecs: jnp.ndarray, centroids: jnp.ndarray,
                   n: int, block: int = 16384) -> np.ndarray:
    """Nearest-centroid assignment for the first n rows of a padded device
    corpus, row-blocked via lax.map to bound the [block, nlist] score temp.

    Blocks OVERLAP at the tail instead of padding (start clamps to
    N - block): padding would copy the whole corpus on device — at 10M x
    128 that second 5.1 GB copy OOMs the chip during train. Overlapping
    rows compute identical assignments, so later blocks harmlessly rewrite
    them on the host."""
    N = int(padded_vecs.shape[0])
    block = min(block, N)
    n_blk = -(-n // block)
    starts_np = np.minimum(np.arange(n_blk) * block, N - block)

    @jax.jit
    def assign_all(v, c, starts):
        c_sq = jnp.sum(c * c, axis=1)

        def one(start):
            x = jax.lax.dynamic_slice(v, (start, 0), (block, v.shape[1]))
            return jnp.argmax(2.0 * (x @ c.T) - c_sq[None, :], axis=1)

        return jax.lax.map(one, starts)

    parts = np.asarray(assign_all(padded_vecs, centroids,
                                  jnp.asarray(starts_np, jnp.int32)))
    out = np.empty(N, np.int64)
    for i, s in enumerate(starts_np):
        out[s:s + block] = parts[i]
    return out[:n]


def _build_capped_lists(assign: np.ndarray, nlist: int, cap_factor: float):
    """Capped dense inverted lists + overflow (vectorized ~3 numpy passes).

    Returns (lists [nlist, M] int32 with -1 pads, overflow item order)."""
    n = len(assign)
    m = max(1, int(np.ceil(cap_factor * n / nlist)))
    order = np.argsort(assign, kind="stable")       # cluster-contiguous
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(nlist))
    rank = np.arange(n) - starts[sorted_assign]     # position within cluster
    keep = rank < m
    lists = np.full((nlist, m), -1, np.int64)
    lists[sorted_assign[keep], rank[keep]] = order[keep]
    return lists.astype(np.int32), order[~keep]


def _pq_train_codebooks(sample: np.ndarray, m: int, iters: int,
                        seed: int) -> jnp.ndarray:
    """Per-subspace 256-centroid codebooks [M, 256, D/M]: ONE vmapped
    k-means over the subspace axis (M concurrent [S, ds] problems)."""
    ds = sample.shape[1] // m
    sub = jnp.asarray(sample.reshape(len(sample), m, ds).transpose(1, 0, 2))
    return jax.vmap(
        lambda v, s: kmeans(v, 256, iters=iters, seed=s))(
        sub, jnp.arange(seed, seed + m))


def _pq_encode(vectors: np.ndarray, codebooks: jnp.ndarray) -> np.ndarray:
    """Encode [N, D] to uint8 codes [N, M] in device blocks (the [B, M, 256]
    score temp bounds the block size)."""
    m = int(codebooks.shape[0])
    ds = int(codebooks.shape[2])
    n = len(vectors)
    blk = 65536
    codes = np.empty((n, m), np.uint8)

    @jax.jit
    def encode(x, cb):                   # x [B, M, ds], cb [M, 256, ds]
        s = jnp.einsum("bmd,mkd->bmk", x, cb)
        s = 2.0 * s - jnp.sum(cb * cb, axis=-1)[None, :, :]
        return jnp.argmax(s, axis=-1).astype(jnp.uint8)

    for start in range(0, n, blk):
        x = jnp.asarray(vectors[start:start + blk].reshape(-1, m, ds).copy())
        codes[start:start + blk] = np.asarray(encode(x, cb=codebooks))
    return codes


def _pq_decode_np(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Host-side decode of uint8 codes [B, M] -> [B, D] (reconstruction)."""
    codes = np.atleast_2d(np.asarray(codes))   # scalar-key reconstruct: [1, M]
    m = codebooks.shape[0]
    return codebooks[np.arange(m)[None, :], codes.astype(np.int64)] \
        .reshape(len(codes), -1)


