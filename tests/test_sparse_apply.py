"""Interpret-mode tests for the Pallas sparse-apply table update
(ops/pallas/sparse_apply.py) against the XLA dense split pipeline.

NOTE the kernel is a measured NEGATIVE on v5e (see the module docstring +
PERF.md): the trainer does not use it. These tests pin its correctness so
the negative result stays reproducible on future toolchains where the
Pallas streaming rate may close the gap.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from recommendflow_tpu.ops.pallas.sparse_apply import (
    _compact_sorted, split_update_pallas)
from recommendflow_tpu.train.optimizers import split_table_update

R, W = 4096, 256


def _mk(n, id_hi=R, seed=0):
    rng = np.random.default_rng(seed)
    p = jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16)
    acc = jnp.asarray(rng.uniform(0.1, 1.0, (R, 1)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, id_hi, n), jnp.int32)
    g = jnp.asarray(rng.standard_normal((n, W)) * 0.01, jnp.float32)
    return p, acc, ids, g


def _compare(p, acc, ids, g):
    pd, ad = split_table_update(p, acc, ids, g, lr=0.05, strategy="dense")
    pp, ap = split_update_pallas(p, acc, ids, g, lr=0.05, interpret=True)
    np.testing.assert_allclose(np.asarray(pp, np.float32),
                               np.asarray(pd, np.float32),
                               rtol=0, atol=0.05)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ad),
                               rtol=1e-3, atol=1e-5)
    return pp, ap


def test_kernel_path_matches_dense():
    p, acc, ids, g = _mk(700)
    assert not bool(_compact_sorted(p, ids, g, 512, 2048)[3])
    pp, ap = _compare(p, acc, ids, g)
    un = np.setdiff1d(np.arange(R), np.asarray(ids))
    # untouched rows must be BIT-identical (neighbor-window rows self-mask)
    np.testing.assert_array_equal(np.asarray(pp)[un], np.asarray(p)[un])
    np.testing.assert_array_equal(np.asarray(ap)[un], np.asarray(acc)[un])


def test_block_boundary_duplicates():
    rng = np.random.default_rng(1)
    p, acc, _, g = _mk(700, seed=1)
    ids = jnp.asarray(np.r_[np.full(50, 2047), np.full(50, 2048),
                            rng.integers(0, R, 600)], jnp.int32)
    _compare(p, acc, ids, g)


def test_overflow_falls_back_to_dense():
    # all ids cluster in block 0 -> window overflow -> XLA dense path
    p, acc, ids, g = _mk(1200, id_hi=600)
    assert bool(_compact_sorted(p, ids, g, 512, 2048)[3])
    _compare(p, acc, ids, g)


def test_small_batch_falls_back():
    # fewer ids than the DMA window -> static Python fallback (n < maxn:
    # the kernel branch would not trace)
    p, acc, ids, g = _mk(100)
    _compare(p, acc, ids, g)
