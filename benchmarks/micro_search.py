"""Microbench: decompose exact top-k retrieval (TpuSearcher.search_block) at
the headline shape (1M x 128 corpus, top-100) to find the bottleneck.

Stages timed separately (interleaved, one process, value-fetch sync):
  matmul   q @ vecs.T -> [Q, N] scores (HBM materialized)
  gmax     reshape + group-max [Q, N/G]
  topk     lax.top_k over group maxima
  gather   candidate gather + final small top-k
  full     the production search_block end-to-end
Also an A/B of query block sizes.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1_000_000
D = 128
K = 100
G = 16
REPS = 10


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: None, out)
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def make(q_block):
    rng = np.random.default_rng(0)
    n_pad = ((N + 511) // 512) * 512
    vecs = jnp.asarray(rng.standard_normal((n_pad, D), np.float32))
    qs = jnp.asarray(rng.standard_normal((q_block, D), np.float32))
    return qs, vecs, n_pad


def bench_stages(q_block):
    qs, vecs, n_pad = make(q_block)

    @jax.jit
    def mm(qs, vecs):
        def body(c, _):
            s = (qs + c) @ vecs.T
            return c + 1e-6, s[0, 0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    @jax.jit
    def mm_gmax(qs, vecs):
        def body(c, _):
            s = (qs + c) @ vecs.T
            gm = jnp.max(s.reshape(q_block, n_pad // G, G), axis=-1)
            return c + 1e-6, gm[0, 0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    @jax.jit
    def mm_gmax_topk(qs, vecs):
        def body(c, _):
            s = (qs + c) @ vecs.T
            gm = jnp.max(s.reshape(q_block, n_pad // G, G), axis=-1)
            v, i = lax.top_k(gm, K)
            return c + 1e-6, v[0, 0] + i[0, 0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    @jax.jit
    def full(qs, vecs):
        def body(c, _):
            s = (qs + c) @ vecs.T
            gm = jnp.max(s.reshape(q_block, n_pad // G, G), axis=-1)
            _, gidx = lax.top_k(gm, K)
            member = gidx[:, :, None] * G + jnp.arange(G)[None, None, :]
            cand_idx = member.reshape(q_block, K * G)
            cand_s = jnp.take_along_axis(s, cand_idx, axis=1)
            v, pos = lax.top_k(cand_s, K)
            idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            return c + 1e-6, v[0, 0] + idx[0, 0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    r = {}
    r["matmul"] = timed(mm, qs, vecs)
    r["+gmax"] = timed(mm_gmax, qs, vecs)
    r["+topk"] = timed(mm_gmax_topk, qs, vecs)
    r["full"] = timed(full, qs, vecs)
    return r


def main():
    print(f"devices: {jax.devices()}")
    for trial in range(3):
        for qb in (256, 512, 1024):
            r = bench_stages(qb)
            qps = qb / (r["full"] / 1e3)
            print(f"trial {trial} Q={qb}: " +
                  "  ".join(f"{k}={v:.2f}ms" for k, v in r.items()) +
                  f"  -> {qps:,.0f} q/s", flush=True)


def bench_pallas_scan(q_block=1024):
    """A/B the XLA scores+group-max against the fused Pallas kernel
    (ops/pallas/grouped_topk.py). Measured v5e, 1M x 128 f32:
    XLA 31 ms / Pallas 13 ms @ Q=1024 (the [Q, N] score matrix never
    reaches HBM in the kernel path)."""
    from recommendflow_tpu.ops.pallas.grouped_topk import grouped_score_max
    rng = np.random.default_rng(0)
    n_pad = ((N + 65535) // 65536) * 65536    # kernel needs % (128*G) == 0
    vecs = jnp.asarray(rng.standard_normal((n_pad, D), np.float32))
    qs = jnp.asarray(rng.standard_normal((q_block, D), np.float32))

    @jax.jit
    def xla(qs, vecs):
        def body(c, _):
            s = (qs + c) @ vecs.T
            m1 = jnp.max(s.reshape(q_block, n_pad // G, G), axis=-1)
            return c + 1e-6, m1[0, 0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    @jax.jit
    def pallas(qs, vecs):
        def body(c, _):
            m1 = grouped_score_max(qs + c, vecs, None, group=G,
                                   num_items=N).T
            return c + 1e-6, m1[0, 0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    for trial in range(3):
        x = timed(xla, qs, vecs)
        p = timed(pallas, qs, vecs)
        print(f"trial {trial}: xla_scan={x:.2f}ms  pallas_scan={p:.2f}ms",
              flush=True)


def bench_prod_stages(q_block=1024):
    """Decompose the PRODUCTION two-level tournament search_block
    (retrieval/searcher.py hierarchical path) stage by stage to find the
    next lever. Each jitted probe runs the pipeline up to stage X and
    returns a scalar from its last array (REPS iterations inside one scan
    so dispatch overhead is amortized and stages are interleaved-comparable).
    """
    from recommendflow_tpu.ops.pallas.grouped_topk import grouped_score_max

    G2 = 16
    rng = np.random.default_rng(0)
    n_pad = ((N + 65535) // 65536) * 65536
    n_sg = n_pad // (G * G2)
    vecs = jnp.asarray(rng.standard_normal((n_pad, D), np.float32))
    vecs_g = jax.jit(lambda v: v.reshape(n_pad // G, G * D))(vecs)
    qs = jnp.asarray(rng.standard_normal((q_block, D), np.float32))

    def stages(queries, vecs, vecs_g, upto):
        nq = queries.shape[0]
        m1 = grouped_score_max(queries, vecs, None, group=G, num_items=N).T
        if upto == "m1":
            return m1
        m2 = jnp.max(m1.reshape(nq, n_sg, G2), axis=-1)
        if upto == "m2":
            return m2
        _, sg = lax.top_k(m2, K)
        if upto == "topk_m2":
            return sg
        c1 = jnp.take_along_axis(m1.reshape(nq, n_sg, G2), sg[:, :, None],
                                 axis=1)
        _, pos = lax.top_k(c1.reshape(nq, K * G2), K)
        gids = (sg[:, :, None] * G2 +
                jnp.arange(G2)[None, None, :]).reshape(nq, K * G2)
        gidx = jnp.take_along_axis(gids, pos, axis=1)
        if upto == "topk_c1":
            return gidx
        gv = vecs_g[gidx]
        if upto == "gather_gv":
            return gv
        cs = jnp.einsum("qkgd,qd->qkg", gv.reshape(nq, K, G, D), queries)
        cand = (gidx[:, :, None] * G +
                jnp.arange(G)[None, None, :]).reshape(nq, K * G)
        cs = jnp.where(cand.reshape(nq, K, G) < N, cs, -1e30).reshape(nq, K * G)
        top_scores, p2 = lax.top_k(cs, K)
        top_idx = jnp.take_along_axis(cand, p2, axis=1)
        return top_scores + top_idx.astype(jnp.float32)

    def probe(upto):
        @jax.jit
        def fn(qs, vecs, vecs_g):
            def body(c, _):
                out = stages(qs + c, vecs, vecs_g, upto)
                return c + 1e-6, out.ravel()[0]
            _, outs = lax.scan(body, jnp.float32(0), None, length=REPS)
            return outs
        return fn

    names = ["m1", "m2", "topk_m2", "topk_c1", "gather_gv", "full"]
    fns = {nm: probe(nm) for nm in names}
    for trial in range(3):
        r = {nm: timed(fns[nm], qs, vecs, vecs_g) for nm in names}
        qps = q_block / (r["full"] / 1e3)
        print(f"trial {trial} Q={q_block}: " +
              "  ".join(f"{k}={v:.2f}ms" for k, v in r.items()) +
              f"  -> {qps:,.0f} q/s", flush=True)


if __name__ == "__main__":
    if "pallas" in sys.argv:
        bench_pallas_scan()
    elif "prod" in sys.argv:
        qb = int(sys.argv[sys.argv.index("prod") + 1]) \
            if len(sys.argv) > sys.argv.index("prod") + 1 else 1024
        bench_prod_stages(qb)
    else:
        main()
