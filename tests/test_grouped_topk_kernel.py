"""Interpret-mode parity for the fused score+group-max Pallas kernel
(ops/pallas/grouped_topk.py) against the plain XLA formulation, across the
three corpus dtypes it supports: f32, bf16, and uint8 SQ8 codes (cast to
bf16 in-VMEM — integers <= 255 are exactly representable there)."""
import numpy as np
import pytest

import jax.numpy as jnp

from recommendflow_tpu.ops.pallas.grouped_topk import NEG, grouped_score_max


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "uint8"])
@pytest.mark.parametrize("l2", [False, True])
def test_kernel_matches_xla_reference(dtype, l2):
    rng = np.random.RandomState(0)
    G = 16
    n, d, q = 128 * G * 2, 128, 8          # two item grid blocks
    num_items = n - 300                    # partial boundary group masked
    qs = rng.randn(q, d).astype(np.float32)
    if dtype == "uint8":
        vec = rng.randint(0, 256, (n, d)).astype(np.uint8)
        vf = vec.astype(np.float32)
        # the kernel casts queries to bf16 for quantized corpora
        qk = np.asarray(qs.astype(jnp.bfloat16)).astype(np.float32)
    elif dtype == "bfloat16":
        vec = rng.randn(n, d).astype(jnp.bfloat16)
        vf = np.asarray(vec).astype(np.float32)
        qk = np.asarray(qs.astype(jnp.bfloat16)).astype(np.float32)
    else:
        vec = rng.randn(n, d).astype(np.float32)
        vf = vec
        qk = qs
    sqn = (vf ** 2).sum(-1).astype(np.float32) if l2 else None
    m1 = grouped_score_max(jnp.asarray(qs), jnp.asarray(vec),
                           jnp.asarray(sqn) if l2 else None,
                           group=G, num_items=num_items, interpret=True)
    s = qk @ vf.T
    if l2:
        s = 2.0 * s - sqn[None, :]
    s = np.where(np.arange(n)[None, :] < num_items, s, NEG)
    ref = s.reshape(q, n // G, G).max(-1)
    np.testing.assert_allclose(np.asarray(m1).T, ref, rtol=1e-4, atol=0.5)
