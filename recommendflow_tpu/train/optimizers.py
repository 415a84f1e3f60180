"""Optimizers tuned for embedding-table training on TPU.

The stacked embedding tables dominate parameter count (e.g. 386M of 386.9M
params in conf/bench_recall.yaml); dense Adam reads/writes p+m+v+g ≈ 16
bytes/param of HBM every step regardless of how few rows a batch touches
(measured: ~61ms/step on v5e). The standard DLRM fix:

  * row-wise Adagrad for tables — ONE accumulator scalar per row (state is
    rows/dim of Adam's), update traffic ≈ p+g+acc;
  * Adam for the dense towers where adaptivity matters.

Composed with optax.multi_transform; table params are identified by the
'table_dim' naming convention of the stacked embedding engine
(ops/embedding.py / models/base.py FeatureEmbedder).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class RowwiseAdagradState(NamedTuple):
    accumulator: Any   # per-leaf: [rows, 1] for 2-D tables, else like-param


# the single source of truth for the Adagrad accumulator seed: the trainer's
# sparse touched-row path (trainer.py:_plan_table_updates) must initialize
# its own accumulators with the SAME value or 'auto' mode silently changes
# training numerics per table
ADAGRAD_INIT_ACCUMULATOR = 0.1


def rowwise_adagrad(learning_rate: float = 0.05,
                    initial_accumulator: float = ADAGRAD_INIT_ACCUMULATOR,
                    eps: float = 1e-10) -> optax.GradientTransformation:
    """DLRM-style row-wise Adagrad: acc_r += mean(g_r^2); p_r -= lr * g_r /
    sqrt(acc_r + eps). For 2-D [rows, dim] params the accumulator is [rows, 1]
    (dim-times less state + traffic than elementwise Adagrad); other shapes
    fall back to elementwise."""

    def init(params):
        def acc_of(p):
            # accumulators stay f32 even for bf16 tables (precision of the
            # running sum matters; its HBM footprint is rows/dim of the table)
            if p.ndim == 2:
                return jnp.full((p.shape[0], 1), initial_accumulator, jnp.float32)
            return jnp.full(p.shape, initial_accumulator, jnp.float32)
        return RowwiseAdagradState(jax.tree.map(acc_of, params))

    def update(grads, state, params=None):
        del params

        def new_acc(g, acc):
            g32 = g.astype(jnp.float32)
            if g.ndim == 2 and acc.ndim == 2 and acc.shape[1] == 1:
                return acc + jnp.mean(g32 * g32, axis=1, keepdims=True)
            return acc + g32 * g32

        accs = jax.tree.map(new_acc, grads, state.accumulator)
        updates = jax.tree.map(
            lambda g, a: (-learning_rate * g.astype(jnp.float32) *
                          jax.lax.rsqrt(a + eps)).astype(g.dtype),
            grads, accs)
        return updates, RowwiseAdagradState(accs)

    return optax.GradientTransformation(init, update)


def _label_params(params, frozen_table_dims=None) -> Any:
    """'table' for stacked embedding tables ('frozen' for those the trainer
    updates itself on the sparse path), 'dense' for everything else."""
    frozen = {f"table_dim{d}" for d in (frozen_table_dims or ())}

    def label(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        name = "/".join(keys)
        if keys and keys[-1] in frozen:
            return "frozen"
        from recommendflow_tpu.parallel.mesh import is_table_param
        return "table" if is_table_param(name) else "dense"
    return jax.tree_util.tree_map_with_path(label, params)


def make_partitioned_optimizer(learning_rate: float = 1e-3,
                               table_learning_rate: Optional[float] = None,
                               dense_optimizer: str = "adam",
                               weight_decay: float = 0.0,
                               clip_norm: float = 0.0,
                               frozen_table_dims=None
                               ) -> optax.GradientTransformation:
    """Adam (dense) + row-wise Adagrad (tables), with an injectable dense LR
    so ReduceLROnPlateau keeps working (train/trainer.py:set_learning_rate).

    frozen_table_dims: dims whose tables the TRAINER updates itself (sparse
    touched-row path) — optax gives them a zero update (an add XLA elides)
    and keeps no state for them."""
    if callable(learning_rate) and table_learning_rate is None:
        raise ValueError("a schedule needs an explicit table_learning_rate "
                         "(tables use a fixed Adagrad LR; pass "
                         "default_table_lr(peak_lr) like the Trainer does)")
    table_lr = table_learning_rate if table_learning_rate is not None \
        else default_table_lr(learning_rate)  # adagrad wants a larger lr
    frozen = set(frozen_table_dims or ())

    def build(learning_rate):
        dense = {
            "adam": lambda: optax.adam(learning_rate),
            "adamw": lambda: optax.adamw(learning_rate, weight_decay=weight_decay),
            "sgd": lambda: optax.sgd(learning_rate),
        }[dense_optimizer]()
        return optax.multi_transform(
            {"dense": dense, "table": rowwise_adagrad(table_lr),
             "frozen": optax.set_to_zero()},
            lambda params: _label_params(params, frozen))

    tx = optax.inject_hyperparams(build)(learning_rate=learning_rate)
    if clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def make_lr_schedule(peak_lr: float, type: str = "cosine",
                     warmup_steps: int = 0, decay_steps: int = 100_000,
                     min_ratio: float = 0.0):
    """Warmup + decay LR schedule (optax schedule callable) for the dense
    optimizer — 'cosine' | 'linear' | 'warmup_constant'. BEYOND the
    reference (fixed Adam LR); pass via Trainer(lr_schedule={...})."""
    end = peak_lr * min_ratio
    if type == "cosine":
        decay = optax.cosine_decay_schedule(peak_lr, decay_steps,
                                            alpha=min_ratio)
    elif type == "linear":
        decay = optax.linear_schedule(peak_lr, end, decay_steps)
    elif type == "warmup_constant":
        decay = optax.constant_schedule(peak_lr)
    else:
        raise ValueError(f"lr schedule '{type}' "
                         "(cosine|linear|warmup_constant)")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, peak_lr, warmup_steps)
        return optax.join_schedules([warmup, decay], [warmup_steps])
    return decay


def default_table_lr(learning_rate: float) -> float:
    """The table LR make_partitioned_optimizer derives from the dense LR."""
    return max(learning_rate * 30.0, 0.01)


def sparse_rowwise_adagrad_update(p: jnp.ndarray, acc: jnp.ndarray,
                                  g_dense: jnp.ndarray, sids: jnp.ndarray,
                                  *, lr: float, eps: float = 1e-10):
    """Row-wise Adagrad applied ONLY to the touched rows of a table.

    (p [R, W], acc [R, 1] f32, g_dense [R, W] combined dense cotangent,
    sids [N] SORTED touched stored-row ids, duplicates allowed) ->
    (p', acc').

    The dense update costs 3 full-table HBM passes regardless of how few
    rows a batch touches (read g + read p + write p ~= 30 ms for a 2.5 GB
    bf16 table at the measured ~250 GB/s ceiling); this variant costs
    ~162 ns per touched row (3 gathers at ~12 ns + 2 sorted scatter-SETs at
    ~63 ns, benchmarks/micro_scatter.py), so it wins when
    3 * table_bytes / 250 GB/s > n_ids * 162 ns — e.g. the ranking bench
    (0.3% rows touched) but NOT the recall bench (5.5%). The trainer's
    'auto' mode applies exactly that inequality per table.

    Duplicate ids are safe: the gradient is already duplicate-combined
    (dense), so every duplicate computes the identical updated row and the
    sorted scatter-SET writes the same bytes. Numerics match the dense
    rowwise_adagrad up to one fewer rounding at bf16 (single f32 round
    instead of round(update)+bf16 add).
    """
    g = jnp.take(g_dense, sids, axis=0).astype(jnp.float32)
    acc_rows = jnp.take(acc, sids, axis=0)
    acc_new = acc_rows + jnp.mean(g * g, axis=1, keepdims=True)
    p_rows = jnp.take(p, sids, axis=0).astype(jnp.float32)
    p_new = (p_rows - lr * g * jax.lax.rsqrt(acc_new + eps)).astype(p.dtype)
    return (p.at[sids].set(p_new, indices_are_sorted=True),
            acc.at[sids].set(acc_new, indices_are_sorted=True))


def segment_row_grads(s: jnp.ndarray, gs32: jnp.ndarray, *, num_rows: int):
    """Combine duplicate SORTED row gradients into per-unique-row sums.

    s [N] sorted int ids, gs32 [N, W] f32 grads in the same order ->
    (summed [N, W] f32 — padding segments hold zero rows, uid [N] int32 —
    real segments hold the row id, padding segments hold DISTINCT
    out-of-bounds ids num_rows + i so the vector stays sorted and truly
    unique, valid [N] bool). Single source of truth for the compaction
    shared by split_table_update's sparse strategies and the Pallas
    sparse-apply kernel (ops/pallas/sparse_apply.py) — their correctness
    contract is 'same update as strategy=dense', so the duplicate-combining
    step must not fork."""
    n = s.shape[0]
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    seg = jnp.cumsum(first) - 1                       # [N] segment index
    k = seg[-1] + 1                                   # real segment count
    valid = jnp.arange(n) < k
    if num_rows < (1 << 24):
        # ride the id compaction on the SAME per-row scatter pass: the
        # first occurrence of each segment contributes its id, duplicates
        # contribute 0, so the segment sum IS the id — exact in f32 (one
        # nonzero term, ids < 2^24). A separate segment_max costs a second
        # full per-row scatter (0.93 ms at the ranking shapes; with this
        # fusion the whole update runs 24.70 -> 23.12 ms/iter device,
        # bit-identical — benchmarks/micro_sort_machinery.py).
        idcol = jnp.where(first, s, 0).astype(jnp.float32)[:, None]
        out = jax.ops.segment_sum(jnp.concatenate([idcol, gs32], axis=1),
                                  seg, num_segments=n,
                                  indices_are_sorted=True)     # [N, 1+W]
        summed = out[:, 1:]
        uid = out[:, 0].astype(jnp.int32)
    else:
        # beyond f32-exact integer range: the two-pass legacy form
        summed = jax.ops.segment_sum(gs32, seg, num_segments=n,
                                     indices_are_sorted=True)  # [N, W]
        uid = jax.ops.segment_max(s, seg, num_segments=n,
                                  indices_are_sorted=True)
    uid = jnp.where(valid, uid, num_rows + jnp.arange(n)).astype(jnp.int32)
    return summed, uid, valid


def split_table_update(p: jnp.ndarray, acc: jnp.ndarray, ids: jnp.ndarray,
                       g: jnp.ndarray, *, lr: float, eps: float = 1e-10,
                       strategy: str = "dense"):
    """Row-wise Adagrad from SPARSE per-row gradients (the split path:
    train/trainer.py gathers rows outside the differentiated step, so
    autodiff emits [N, W] row cotangents and no dense scattered table
    cotangent ever exists — the ~8.4 ms zero-init+scatter pass the ranking
    step's device trace showed, PERF.md).

    p [R, W], acc [R, 1] f32, ids [N] physical rows (duplicates allowed,
    any order), g [N, W] row grads -> (p', acc').

    strategy='dense': scatter-add g into a dense [R, W] (sorted) and run
    the fused dense update — bit-identical to the dense-cotangent pipeline;
    streaming-bound (~5 table passes). Wins at high touched fractions
    (recall's 5.5%).
    strategy='sparse': sorted segment-sum to per-unique-row sums, then
    scatter-ADD the update delta — per-touched-row-bound (~92 ns/row).
    Wins at low touched fractions (ranking's ~2% stored rows).
    strategy='sparse_set': same segment-sum, but gather the touched rows
    (12 ns/row), compute the updated values, and scatter-SET them with
    sorted+unique indices (63 ns/row measured vs 80-108 for ADD,
    benchmarks/micro_scatter.py). Padding segments route to DISTINCT
    out-of-bounds rows and are dropped (mode='drop'), keeping the index
    vector sorted AND truly unique so the fast scatter path applies.
    All strategies square the SUM of duplicate grads (dense scatter-add
    semantics) and produce identical updates up to dtype rounding.
    """
    # ONE sort yields both the sorted ids and the permutation: argsort
    # followed by ids[order] re-derives the sorted keys with a second
    # 106k-element gather (0.78 ms/step at the ranking shapes,
    # benchmarks/micro_sort_machinery.py)
    s, order = jax.lax.sort_key_val(
        ids, jnp.arange(ids.shape[0], dtype=jnp.int32))
    gs = jnp.take(g, order, axis=0)

    if strategy == "dense":
        gd = jnp.zeros_like(p).at[s].add(gs.astype(p.dtype),
                                         indices_are_sorted=True)
        g32 = gd.astype(jnp.float32)
        acc2 = acc + jnp.mean(g32 * g32, axis=1, keepdims=True)
        p2 = (p.astype(jnp.float32)
              - lr * g32 * jax.lax.rsqrt(acc2 + eps)).astype(p.dtype)
        return p2, acc2

    if strategy not in ("sparse", "sparse_set"):
        raise ValueError(f"unknown split strategy {strategy!r}")
    summed, uid, valid = segment_row_grads(s, gs.astype(jnp.float32),
                                           num_rows=p.shape[0])

    if strategy == "sparse_set":
        d_acc = jnp.mean(summed * summed, axis=1, keepdims=True)
        acc_new = jnp.take(acc, uid, axis=0, mode="clip") + d_acc
        acc2 = acc.at[uid].set(acc_new, indices_are_sorted=True,
                               unique_indices=True, mode="drop")
        upd = -lr * summed * jax.lax.rsqrt(acc_new + eps)
        p_new = (jnp.take(p, uid, axis=0, mode="clip").astype(jnp.float32)
                 + upd).astype(p.dtype)
        p2 = p.at[uid].set(p_new, indices_are_sorted=True,
                           unique_indices=True, mode="drop")
        return p2, acc2

    # ADD semantics: clamp padding segments back IN bounds to the LAST real
    # uid — still sorted, duplicates safe under ADD, deltas zeroed below
    uid = jnp.where(valid, uid, s[-1])
    d_acc = jnp.where(valid[:, None],
                      jnp.mean(summed * summed, axis=1, keepdims=True), 0.0)
    acc2 = acc.at[uid].add(d_acc, indices_are_sorted=True)
    acc_rows = jnp.take(acc2, uid, axis=0)            # [N, 1] post-update
    upd = -lr * summed * jax.lax.rsqrt(acc_rows + eps)
    upd = jnp.where(valid[:, None], upd, 0.0)
    p2 = p.at[uid].add(upd.astype(p.dtype), indices_are_sorted=True)
    return p2, acc2
