"""The training runtime: one jitted train_step under an explicit device mesh.

Replaces the reference's Keras compile/fit stack (example/recall_search/
train.py:93-111 + MirroredStrategy, gpu_utils.py:13-14) with:
  * a flax TrainState (params + batch_stats + optax state) whose learning
    rate is runtime-adjustable (optax.inject_hyperparams) so the plateau
    callback works without recompiling,
  * train_step jitted once per config; with a mesh given, batches are
    device_put with batch-axis sharding and params replicated (tables
    optionally row-sharded) — XLA partitions the step and inserts the
    gradient all-reduce (the NCCL all-reduce equivalent rides ICI),
  * epoch loop with prefetch, callbacks (early stop / plateau / checkpoints /
    retrieval eval), debug take-N batches, metric tables.

Losses see the GLOBAL batch under pjit semantics: q@dT over a dp-sharded
batch is partitioned by XLA with the needed all-gather — no manual
collectives in the model code (the shard_map/axis_name path exists for
explicit control; both are tested equal in tests/test_losses.py).
"""
from __future__ import annotations

import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core
from flax.training import train_state as flax_train_state

from recommendflow_tpu.data.pipeline import Dataset, prefetch
from recommendflow_tpu.parallel.mesh import (
    apply_shardings, expert_sharding_rules, merge_rules, replicated,
    table_sharding_rules,
)
from recommendflow_tpu.train.callbacks import Callback, History
from recommendflow_tpu.train.optimizers import make_lr_schedule
from recommendflow_tpu.utils.logger import get_logger
from recommendflow_tpu.utils.tables import print_table

log = get_logger("recflow.trainer")


class _PreemptSync:
    """Cross-process agreement on the preemption stop step.

    A SIGTERM lands on each host at a slightly different time; if one
    process stops dispatching steps while another dispatches one more, the
    straggler deadlocks in that step's collectives. Every step each process
    contributes its local preempt flag to a tiny [num_devices] max-reduce
    (dispatched async — no sync), and fetches the agreement from `window`
    steps ago (long since materialized, so the fetch doesn't stall the
    pipeline). All processes therefore observe the same agreed flag at the
    same loop index and stop after dispatching the SAME number of steps.
    The reference has no multi-host training at all (SURVEY §2.7 —
    MirroredStrategy is single-host); this is TPU-pod-grade preemption.
    """

    def __init__(self, window: int = 16):
        from collections import deque

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        self.window = window
        self.pending: "deque" = deque()
        mesh = Mesh(np.asarray(jax.devices()), ("all",))
        self._sharding = NamedSharding(mesh, P("all"))
        self._any = jax.jit(jnp.max)

    def _agree(self, flag: bool):
        local = np.full((jax.local_device_count(),), 1 if flag else 0,
                        np.int32)
        garr = jax.make_array_from_process_local_data(self._sharding, local)
        return self._any(garr)

    def push(self, flag: bool) -> None:
        """Contribute this step's local flag (call once per dispatched step
        on EVERY process — the reduce is a collective)."""
        self.pending.append(self._agree(flag))

    def should_stop(self) -> bool:
        """Check settled agreements (non-collective). Agreements are
        consumed DETERMINISTICALLY: each is fetched exactly `window` pushes
        after its dispatch, so every process pops at the same loop index
        and stops after the SAME number of dispatched steps. (Popping early
        when a fetch happens to be ready — is_ready() — is per-host timing
        and desyncs the fleet: one host would stop at step s, another at
        s+3, and the straggler's collectives deadlock.) The fetch is
        `window` steps stale by then, so it is materialized in steady state
        and doesn't stall the async pipeline (CLAUDE.md: per-step syncs
        collapse fit throughput)."""
        stop = False
        while len(self.pending) > self.window:
            stop |= int(self.pending.popleft()) > 0
        return stop

    def agree(self, flag: bool) -> bool:
        """One immediate agreement (collective — every process must call at
        the same point): True iff ANY process raised `flag`."""
        return int(self._agree(flag)) > 0

    def drain(self, flag: bool) -> bool:
        """Epoch boundary: settle all pending agreements plus one fresh one
        (collective — every process must call). The fresh agreement is
        dispatched unconditionally: short-circuiting it on a locally-known
        stop would leave other processes blocked in the reduce."""
        stop = any(int(x) > 0 for x in self.pending)
        self.pending.clear()
        agreed = self.agree(flag)
        return stop or agreed


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None
    extra_vars: Any = None   # non-param collections beyond batch_stats (e.g. 'stats')
    rng: Any = None
    table_acc: Any = None    # row-wise Adagrad accumulators of tables on the
    # SPARSE update path (Trainer(table_update=...)); None on the dense path
    # where the accumulator lives inside the optax state


def make_optimizer(learning_rate: float = 1e-3, optimizer: str = "adam",
                   weight_decay: float = 0.0, clip_norm: float = 0.0):
    """Adam by default (parity: train.py:96 Adam(lr)); LR is injected so
    callbacks can rescale it in-flight."""
    opts = {
        "adam": lambda learning_rate: optax.adam(learning_rate),
        "adamw": lambda learning_rate: optax.adamw(learning_rate, weight_decay=weight_decay),
        "adagrad": lambda learning_rate: optax.adagrad(learning_rate),
        "sgd": lambda learning_rate: optax.sgd(learning_rate),
        "lamb": lambda learning_rate: optax.lamb(learning_rate, weight_decay=weight_decay),
    }
    if optimizer not in opts:
        raise ValueError(f"unknown optimizer '{optimizer}'; have {sorted(opts)}")
    base = optax.inject_hyperparams(opts[optimizer])(learning_rate=learning_rate)
    if clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_norm), base)
    return base


def _set_path(tree, target_path, value):
    """Return `tree` with the leaf at `target_path` replaced by `value`."""
    def pick(path, leaf):
        return value if path == target_path else leaf
    return jax.tree_util.tree_map_with_path(pick, tree)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Rewrite the injected learning_rate inside the optax state."""
    def rewrite(os_):
        if hasattr(os_, "hyperparams") and "learning_rate" in os_.hyperparams:
            hp = dict(os_.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return os_._replace(hyperparams=hp)
        if isinstance(os_, tuple) and not hasattr(os_, "hyperparams"):
            return type(os_)(*(rewrite(o) for o in os_))
        return os_
    return state.replace(opt_state=rewrite(state.opt_state))


def current_learning_rate(state: TrainState) -> Optional[float]:
    def find(os_):
        if hasattr(os_, "hyperparams") and "learning_rate" in os_.hyperparams:
            return float(os_.hyperparams["learning_rate"])
        if isinstance(os_, tuple) and not hasattr(os_, "hyperparams"):
            for o in os_:
                got = find(o)
                if got is not None:
                    return got
        return None
    return find(state.opt_state)


class Trainer:
    """Functional trainer bound to one model + optimizer (+ optional mesh)."""

    def __init__(self,
                 model,
                 optimizer=None,
                 learning_rate: float = 1e-3,
                 lr_schedule=None,
                 mesh=None,
                 shard_tables: bool = False,
                 shard_experts: bool = False,
                 table_update: str = "auto",
                 seed: int = 0):
        self.model = model
        self._default_tx = optimizer is None
        # lr_schedule (BEYOND the reference, which trains at a fixed Adam
        # LR): None, an optax schedule callable, or a dict like
        # {"type": "cosine"|"linear"|"warmup_constant",
        #  "warmup_steps": 1000, "decay_steps": 100_000, "min_ratio": 0.1}
        # with learning_rate as the peak. A schedule re-derives the dense LR
        # every step, so ReduceLROnPlateau/set_learning_rate have no effect
        # while one is active (tables keep their fixed Adagrad LR).
        self._lr_or_schedule = (
            make_lr_schedule(learning_rate, **lr_schedule)
            if isinstance(lr_schedule, dict)
            else (lr_schedule or learning_rate))
        if optimizer is None:
            # default: Adam for dense params + row-wise Adagrad for embedding
            # tables — bounds optimizer HBM traffic by touched rows' dim-mean
            # instead of 3 full dense passes (train/optimizers.py)
            from recommendflow_tpu.train.optimizers import (
                default_table_lr, make_partitioned_optimizer)
            optimizer = make_partitioned_optimizer(
                self._lr_or_schedule,
                table_learning_rate=default_table_lr(learning_rate))
        self.tx = optimizer
        self.base_lr = learning_rate
        self.mesh = mesh
        self.shard_tables = shard_tables
        # expert parallelism: place ExpertsMLP params P('ep', ...) so each
        # chip holds+runs E/|ep| experts (mesh must have an 'ep' axis)
        self.shard_experts = shard_experts
        # 'dense' | 'sparse' | 'split' | 'auto': how embedding-table rows
        # get their row-wise Adagrad step.
        # 'sparse' updates only the rows a batch touches, gathering them
        # from the dense cotangent (train/optimizers.py:
        # sparse_rowwise_adagrad_update).
        # 'split' gathers table rows OUTSIDE the differentiated step so
        # autodiff yields [N, W] row cotangents directly — no dense
        # scattered table cotangent is ever materialized (the device trace
        # showed that zero-init+scatter pass costing 8.4 ms/step on the
        # ranking bench, PERF.md) — then applies a per-table
        # dense-scatter or sorted sparse-ADD update by cost model
        # (train/optimizers.py:split_table_update). Needs a model that
        # embeds every sparse slot in ONE embed_batch pass
        # (model.row_injection = True) and unsharded tables.
        # 'auto' prefers 'split' when the model supports it, else the
        # legacy dense-vs-sparse cost model.
        if table_update not in ("dense", "sparse", "auto", "split"):
            raise ValueError(f"table_update must be dense|sparse|split|auto, "
                             f"got '{table_update}'")
        self.table_update = table_update
        self._sparse_dims: Dict[int, Any] = {}
        self._split_dims: Dict[int, str] = {}  # dim -> update strategy
        self.seed = seed
        self.control: Dict[str, Any] = {"stop": False, "lr_scale": 1.0}
        self._train_step = None
        self._train_step_scan = None
        self._eval_step = None
        self._predict_step = None

    # ------------------------------------------------------------- state
    def init_state(self, sample_batch: Dict[str, jnp.ndarray]) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        init_rng, state_rng = jax.random.split(rng)
        # jit the init: eagerly, flax dispatches every table/layer init as
        # a separate device op — ~0.3 s each over tunneled platforms, 68 s
        # total for the 386M-param bench model. One compiled program runs
        # it in ~2 s (and the persistent compilation cache makes warm
        # processes skip the compile: 68 -> 4 s measured end-to-end).
        variables = jax.jit(self.model.init, static_argnames=("training",))(
            init_rng, sample_batch, training=False)
        params = variables["params"]
        # Networks.pretrained grafts (BERT-checkpoint import): replace the
        # named encoder subtrees with converted pretrained weights before
        # any device placement (encoder/pretrained.py)
        from recommendflow_tpu.encoder.pretrained import apply_pretrained
        params = apply_pretrained(self.model, params)
        batch_stats = variables.get("batch_stats", flax_core.freeze({}))
        extra = {k: v for k, v in variables.items()
                 if k not in ("params", "batch_stats")}
        table_acc = self._plan_table_updates(params, sample_batch)
        if self._split_dims:
            # fail fast on the silent-grad-drop footgun (VERDICT r4 #3): a
            # model misflagged row_injection=True would otherwise train
            # with part of its table gradients dropped and never error
            self._validate_row_injection(
                {"params": params, "batch_stats": batch_stats, **extra},
                sample_batch)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.tx,
            batch_stats=batch_stats, extra_vars=flax_core.freeze(extra),
            rng=state_rng, table_acc=table_acc)
        if self.mesh is not None:
            rules = None
            if self.shard_tables:
                rules = table_sharding_rules(state.params, self.mesh)
            if self.shard_experts:
                er = expert_sharding_rules(state.params, self.mesh)
                rules = er if rules is None else merge_rules(rules, er)
            if rules is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                params = apply_shardings(state.params, self.mesh, rules)
                # optimizer accumulators mirroring a sharded param must
                # shard the same way, or the HBM saved by sharding is spent
                # again on its optimizer state. Optimizer state trees mirror
                # the param tree (optax mu/nu, row-wise Adagrad
                # accumulators), so match each opt leaf to its param by
                # KEY-PATH suffix — matching by bare shape can collide (a
                # replicated tower kernel vs an ep-sharded expert bias of
                # the same shape would mis-shard the tower's mu/nu).
                p_paths, _ = jax.tree_util.tree_flatten_with_path(state.params)
                path_specs = [
                    (jax.tree_util.keystr(path), spec)
                    for (path, _), spec in zip(p_paths, jax.tree.leaves(rules))
                    if spec != P()]
                # longest param path first: "['Dense_0']['kernel']" is also
                # a suffix of "...['tower']['Dense_0']['kernel']"
                path_specs.sort(key=lambda ps: -len(ps[0]))

                def place_opt(path, leaf):
                    if not hasattr(leaf, "shape"):
                        return leaf
                    ks = jax.tree_util.keystr(path)
                    for pks, spec in path_specs:
                        if not ks.endswith(pks):
                            continue
                        # accumulators may drop trailing dims (row-wise
                        # Adagrad keeps [rows] for a [rows, d] table)
                        axes = tuple(spec)[:leaf.ndim]
                        ok = all(
                            ax is None or (isinstance(ax, str) and
                                           leaf.shape[i] % self.mesh.shape[ax] == 0)
                            for i, ax in enumerate(axes))
                        if ok:
                            return jax.device_put(
                                leaf, NamedSharding(self.mesh, P(*axes)))
                        break
                    return jax.device_put(leaf, replicated(self.mesh))
                opt_state = jax.tree_util.tree_map_with_path(
                    place_opt, state.opt_state)
                state = state.replace(params=params, opt_state=opt_state)
                if state.table_acc:
                    # sparse-update accumulators ([R, 1] per table) mirror
                    # their table's row sharding — the touched-row scatter
                    # then stays partition-local under GSPMD
                    placed = self._table_leaves(params)
                    acc = {k: jax.device_put(v, placed[int(k[3:])][1].sharding)
                           for k, v in state.table_acc.items()}
                    state = state.replace(table_acc=acc)
            else:
                state = jax.device_put(state, replicated(self.mesh))
        n = sum(x.size for x in jax.tree.leaves(state.params))
        log.info("initialized %s: %.3fM params%s", type(self.model).__name__,
                 n / 1e6, f" on mesh {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}"
                 if self.mesh is not None else "")
        return state

    # ------------------------------------------------- sparse table updates
    @staticmethod
    def _table_leaves(params) -> Dict[int, Tuple[Any, Any]]:
        """dim -> (path, leaf) for every 'table_dim{d}' param."""
        import re
        found = {}

        def visit(path, leaf):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            m = re.search(r"table_dim(\d+)$", name)
            if m:
                found[int(m.group(1))] = (path, leaf)
            return leaf

        jax.tree_util.tree_map_with_path(visit, params)
        return found

    def _plan_table_updates(self, params, sample_batch):
        """Decide per-table dense vs sparse row-wise Adagrad and return the
        accumulator pytree for the sparse tables (None if all dense).

        Cost model (measured, CLAUDE.md): dense = 3 full-table HBM passes at
        ~250 GB/s; sparse = ~162 ns per touched row (3 gathers + 2 sorted
        scatter-SETs). 'auto' picks sparse when dense costs more."""
        self._sparse_dims = {}
        self._split_dims = {}
        schema = getattr(self.model, "schema", None)
        if (self.table_update == "dense" or not self._default_tx
                or schema is None):
            return None
        if self.table_update in ("auto", "split") \
                and getattr(self.model, "row_injection", False) \
                and not self.shard_tables:
            return self._plan_split_updates(params, sample_batch, schema)
        if self.table_update == "split":
            log.warning("table_update='split' needs model.row_injection and "
                        "unsharded tables; falling back to the legacy "
                        "dense/sparse cost model")
        # shard_tables composes: the touched-row gather/scatter runs on the
        # row-sharded table under GSPMD (each partition masks the updates
        # that fall in its row range — the sorted-scatter hint survives
        # partitioning); the accumulator is sharded alongside in init_state
        n_ids: Dict[int, int] = {}
        for name in schema.order:
            slot = schema.slots[name]
            if slot.kind == "sparse" and name in sample_batch:
                n_ids[slot.dim] = n_ids.get(slot.dim, 0) + \
                    int(np.prod(sample_batch[name].shape))
        acc = {}
        for dim, (path, leaf) in self._table_leaves(params).items():
            if dim not in n_ids:
                continue
            dense_cost = 3.0 * leaf.size * leaf.dtype.itemsize / 250e9
            sparse_cost = n_ids[dim] * 162e-9
            if self.table_update == "sparse" or dense_cost > sparse_cost:
                from recommendflow_tpu.train.optimizers import (
                    ADAGRAD_INIT_ACCUMULATOR)
                self._sparse_dims[dim] = path
                acc[f"dim{dim}"] = jnp.full((leaf.shape[0], 1),
                                            ADAGRAD_INIT_ACCUMULATOR,
                                            jnp.float32)
        if not self._sparse_dims:
            return None
        # rebuild the optimizer so optax no longer touches the sparse
        # tables (their update+state would otherwise cost the dense passes)
        from recommendflow_tpu.train.optimizers import (
            default_table_lr, make_partitioned_optimizer)
        self._table_lr = default_table_lr(self.base_lr)
        self.tx = make_partitioned_optimizer(
            self._lr_or_schedule, table_learning_rate=self._table_lr,
            frozen_table_dims=set(self._sparse_dims))
        log.info("sparse table updates for dims %s (touched-row cost < "
                 "3 dense passes)", sorted(self._sparse_dims))
        return acc

    def _plan_split_updates(self, params, sample_batch, schema):
        """Split-path planning: every table dim present in the batch gets a
        frozen optax label + an accumulator, and a per-table update strategy
        from the device-measured cost model (PERF.md §3/§3b): the dense
        pipeline is ~5 table passes at ~494 GB/s effective; the sorted
        sparse_set path (scatter-SET of computed rows with sorted+unique
        indices) costs ~78 ns per touched row + ~2.5 ms fixed prep — the
        78e-9 below and this note must move together."""
        n_ids: Dict[int, int] = {}
        for name in schema.order:
            slot = schema.slots[name]
            if slot.kind == "sparse" and name in sample_batch:
                n_ids[slot.dim] = n_ids.get(slot.dim, 0) + \
                    int(np.prod(sample_batch[name].shape))
        acc = {}
        from recommendflow_tpu.train.optimizers import (
            ADAGRAD_INIT_ACCUMULATOR, default_table_lr,
            make_partitioned_optimizer)
        for dim, (path, leaf) in self._table_leaves(params).items():
            if dim not in n_ids:
                continue
            dense_cost = 5.0 * leaf.size * leaf.dtype.itemsize / 494e9
            # sparse_set: sorted+unique scatter-SET of computed rows
            # (63 ns/row vs 80-108 for ADD) — measured 1.5 ms/step faster
            # than the ADD path at the ranking workload (106k rows,
            # benchmarks/micro_split_update.py: 14.1 vs 15.6 ms/iter)
            sparse_cost = n_ids[dim] * 78e-9 + 2.5e-3
            self._split_dims[dim] = \
                "sparse_set" if sparse_cost < dense_cost else "dense"
            acc[f"dim{dim}"] = jnp.full((leaf.shape[0], 1),
                                        ADAGRAD_INIT_ACCUMULATOR,
                                        jnp.float32)
        if not self._split_dims:
            return None
        self._table_lr = default_table_lr(self.base_lr)
        self.tx = make_partitioned_optimizer(
            self._lr_or_schedule, table_learning_rate=self._table_lr,
            frozen_table_dims=set(self._split_dims))
        log.info("split table updates: %s (rows gathered outside the "
                 "differentiated step; no dense table cotangent)",
                 {f"dim{d}": s for d, s in sorted(self._split_dims.items())})
        return acc

    def _validate_row_injection(self, variables, sample_batch) -> None:
        """Static one-time guard for the split path (VERDICT r4 #3).

        Under table_update='split' the optax labels FREEZE every split
        table, so only gradients flowing through the injected rows reach
        the update. A model flagged `row_injection = True` whose graph
        reads a split table anywhere else (a per-tower embed, an
        `unpooled()` gather — the Pdm/Que2Search shape) would train with
        those reads' gradients silently zeroed: it converges worse and
        never errors. Here we abstract-trace the training-mode apply with
        rows injected (host-side tracing only — no compile, no device
        work beyond a PRNG key) and require every split table param to be
        an UNUSED jaxpr input: with `wide_rows` present, `gather_group`
        touches the table for shape/dtype metadata only, so any surviving
        use is a read outside the injected pass."""
        import re as _re

        from jax.extend import core as jcore

        from recommendflow_tpu.ops.embedding import rows_key

        params = variables["params"]
        schema = self.model.schema
        leaves = self._table_leaves(params)
        per_ex: Dict[int, int] = {}
        for name in schema.order:
            slot = schema.slots[name]
            if slot.kind == "sparse" and name in sample_batch \
                    and slot.dim in self._split_dims:
                per_ex[slot.dim] = per_ex.get(slot.dim, 0) + int(
                    np.prod(sample_batch[name].shape[1:]))
        b = 2
        tiny = {k: jax.ShapeDtypeStruct((b,) + tuple(v.shape[1:]), v.dtype)
                for k, v in sample_batch.items()}
        rows = {d: jax.ShapeDtypeStruct((b * n, leaves[d][1].shape[1]),
                                        leaves[d][1].dtype)
                for d, n in per_ex.items()}
        p_structs = jax.tree.map(
            lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype), params)
        others = {k: v for k, v in variables.items()
                  if k != "params" and v}
        mutable = list(others.keys())
        rng = jax.random.PRNGKey(0)

        def fwd(params_in, rows_in, batch_in):
            bb = dict(batch_in)
            bb.update({rows_key(d): r for d, r in rows_in.items()})
            out = self.model.apply({"params": params_in, **others}, bb,
                                   training=True, rngs={"dropout": rng},
                                   mutable=mutable if mutable else False)
            (loss, _aux) = out[0] if mutable else out
            return loss

        closed = jax.make_jaxpr(fwd)(p_structs, rows, tiny)
        # invars follow the tree-flatten order of (params, rows, batch),
        # so each split table's invar position is its index within the
        # params prefix
        p_flat = jax.tree_util.tree_flatten_with_path(p_structs)[0]
        dim_at: Dict[int, int] = {}
        for i, (path, _leaf) in enumerate(p_flat):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            m = _re.search(r"table_dim(\d+)$", name)
            if m and int(m.group(1)) in self._split_dims:
                dim_at[i] = int(m.group(1))
        used = set()
        for eqn in closed.jaxpr.eqns:
            used.update(v for v in eqn.invars
                        if not isinstance(v, jcore.Literal))
        used.update(v for v in closed.jaxpr.outvars
                    if not isinstance(v, jcore.Literal))
        offending = sorted(dim for i, dim in dim_at.items()
                           if closed.jaxpr.invars[i] in used)
        if offending:
            raise ValueError(
                f"{type(self.model).__name__} sets row_injection=True but "
                f"its training graph still reads table(s) "
                f"{[f'dim{d}' for d in offending]} outside the injected "
                f"embed pass — under table_update='split'/'auto' those "
                f"reads' gradients would be SILENTLY DROPPED (the split "
                f"planner freezes table params). Either route every table "
                f"read through the single embed_batch pass, or set "
                f"row_injection = False on the model (the trainer then "
                f"uses the dense/sparse cost-model path).")

    def _apply_split_table_updates(self, state: TrainState, row_grads, phys):
        """Apply the per-dim split updates from sparse row cotangents."""
        from recommendflow_tpu.train.optimizers import split_table_update
        leaves = self._table_leaves(state.params)
        new_params = state.params
        new_acc = dict(state.table_acc)
        for dim, strategy in self._split_dims.items():
            if dim not in phys:
                continue
            path, p_leaf = leaves[dim]
            key = f"dim{dim}"
            p_new, a_new = split_table_update(
                p_leaf, state.table_acc[key], phys[dim], row_grads[dim],
                lr=self._table_lr, strategy=strategy)
            new_acc[key] = a_new
            new_params = _set_path(new_params, path, p_new)
        return state.replace(params=new_params, table_acc=new_acc)

    def _apply_sparse_table_updates(self, state: TrainState, grads, batch):
        """Replace the (frozen-by-optax) sparse tables' rows in-place."""
        from recommendflow_tpu.ops.embedding import touched_stored_rows
        from recommendflow_tpu.train.optimizers import (
            sparse_rowwise_adagrad_update)
        schema = self.model.schema
        leaves = self._table_leaves(state.params)
        shape_view = {f"dim{d}": leaf for d, (_, leaf) in leaves.items()}
        touched = touched_stored_rows(schema, shape_view, batch)
        grad_leaves = self._table_leaves(grads)
        new_params = state.params
        new_acc = dict(state.table_acc)
        for dim, (path, p_leaf) in leaves.items():
            if dim not in self._sparse_dims:
                continue
            key = f"dim{dim}"
            p_new, a_new = sparse_rowwise_adagrad_update(
                p_leaf, state.table_acc[key], grad_leaves[dim][1],
                touched[key], lr=self._table_lr)
            new_acc[key] = a_new
            new_params = _set_path(new_params, path, p_new)
        return state.replace(params=new_params, table_acc=new_acc)

    # -------------------------------------------------------------- steps
    @staticmethod
    def _variables(state: TrainState, params=None):
        variables = {"params": params if params is not None else state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if state.extra_vars:
            variables.update(state.extra_vars)
        return variables

    def _step_body(self, state: TrainState, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        mutable = [k for k in self._variables(state) if k != "params"]

        phys, rows = {}, {}
        if self._split_dims:
            # gather each split table's rows OUTSIDE the differentiated
            # function: autodiff then produces [N, W] row cotangents and no
            # dense scattered table cotangent ever exists (PERF.md)
            from recommendflow_tpu.ops.embedding import (
                fused_group_ids, physical_ids, take_rows)
            gids = fused_group_ids(self.model.schema, batch)
            for dim, (_path, table) in self._table_leaves(state.params).items():
                if dim in self._split_dims and dim in gids:
                    pid = physical_ids(table, dim, gids[dim])
                    phys[dim] = pid
                    rows[dim] = take_rows(table, pid)

        def loss_fn(params, rows_in):
            b = batch
            if rows_in:
                from recommendflow_tpu.ops.embedding import rows_key
                b = dict(batch)
                b.update({rows_key(d): r for d, r in rows_in.items()})
            out = state.apply_fn(self._variables(state, params), b,
                                 training=True,
                                 rngs={"dropout": step_rng},
                                 mutable=mutable if mutable else False)
            if mutable:
                (loss, aux), new_state = out
            else:
                (loss, aux), new_state = out, {}
            return loss, (aux, new_state)

        if self._split_dims:
            grads_fn = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                          has_aux=True)
            (loss, (aux, new_model_state)), (grads, row_grads) = \
                grads_fn(state.params, rows)
        else:
            grads_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (aux, new_model_state)), grads = \
                grads_fn(state.params, {})
            row_grads = None
        state = state.apply_gradients(grads=grads)
        if self._sparse_dims:
            # tables on the sparse path got a zero optax update above (a
            # no-op add XLA elides); write their touched rows here
            state = self._apply_sparse_table_updates(state, grads, batch)
        if self._split_dims:
            state = self._apply_split_table_updates(state, row_grads, phys)
        if "batch_stats" in new_model_state:
            state = state.replace(batch_stats=new_model_state["batch_stats"])
        extra_mut = {k: v for k, v in new_model_state.items()
                     if k != "batch_stats"}
        if extra_mut:
            # persist OTHER mutated collections too (e.g. the 'freq'
            # streaming-frequency state of the logQ correction) — they were
            # previously computed and dropped
            merged = dict(state.extra_vars) if state.extra_vars else {}
            merged.update(extra_mut)
            state = state.replace(extra_vars=flax_core.freeze(merged))
        metrics = {"loss": loss, **aux}
        return state, metrics

    def _build_train_step(self):
        return jax.jit(self._step_body, donate_argnums=(0,))

    def _build_train_step_scan(self):
        """K steps per dispatch via lax.scan over stacked batches [K, B, ...]
        — amortizes the per-call host->device dispatch latency (~3 ms on
        tunneled platforms). Metrics are means over the K steps. One jit
        wrapper serves every K (jit retraces per stacked shape)."""
        def multi(state: TrainState, batches):
            def body(s, b):
                s2, m = self._step_body(s, b)
                return s2, m
            state, ms = jax.lax.scan(body, state, batches)
            return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
        return jax.jit(multi, donate_argnums=(0,))

    def _build_eval_step(self):
        def eval_step(state: TrainState, batch):
            mutable = list(state.extra_vars.keys()) if state.extra_vars else False
            out = state.apply_fn(self._variables(state), batch, training=False,
                                 mutable=mutable)
            # predict-time collection updates (e.g. fusion infer_weights) are
            # discarded here; introspect them via model.apply directly
            return out[0] if mutable else out
        return jax.jit(eval_step)

    def _put(self, batch: Dict[str, np.ndarray]):
        if self.mesh is not None:
            # shard_batch owns batch placement (incl. the multi-host
            # per-process-data path) — keep exactly one implementation
            from recommendflow_tpu.parallel.mesh import shard_batch
            return shard_batch(self.mesh, batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def train_step(self, state, batch):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step(state, self._put(batch))

    @staticmethod
    def _stack_batches(batches):
        return {key: np.stack([b[key] for b in batches])
                for key in batches[0]}

    def train_steps(self, state, batches):
        """Run len(batches) steps in ONE dispatch (lax.scan)."""
        return self._train_steps_stacked(state, self._stack_batches(batches))

    def _train_steps_stacked(self, state, stacked):
        """Scan-K dispatch on an already-stacked [K, B, ...] batch dict
        (fit()'s chunked hot loop stacks in the prefetch worker thread so
        the memcpy overlaps device compute)."""
        if self._train_step_scan is None:
            self._train_step_scan = self._build_train_step_scan()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(None, "dp"))  # axis0=K, axis1=batch
            if jax.process_count() > 1:
                # per-host stacks are LOCAL data: device_put with a global
                # sharding would treat each host's array as the full global
                # value and silently drop the other hosts' examples
                # (CLAUDE.md; shard_batch does the same for single batches)
                stacked = {
                    key: jax.make_array_from_process_local_data(sh, v)
                    for key, v in stacked.items()}
            else:
                stacked = {key: jax.device_put(v, sh)
                           for key, v in stacked.items()}
        else:
            stacked = {key: jnp.asarray(v) for key, v in stacked.items()}
        return self._train_step_scan(state, stacked)

    def eval_step(self, state, batch):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step(state, self._put(batch))

    # --------------------------------------------------------------- loops
    @staticmethod
    def _fetch(x) -> np.ndarray:
        """Device -> host numpy; multi-process runs allgather only for
        arrays that actually span non-addressable devices (plain np.asarray
        raises on those; CLAUDE.md, same rule save_pytree follows). A fully
        replicated output must NOT be allgathered: tiled=True would
        concatenate each host's identical copy and silently return
        process_count duplicates."""
        if (jax.process_count() > 1 and isinstance(x, jax.Array)
                and not x.is_fully_replicated
                and not x.is_fully_addressable):
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    def predict(self, state, dataset: Iterable) -> Dict[str, np.ndarray]:
        """Stacked model outputs over a dataset (parity surface:
        model.predict under MirroredStrategy, predict.py:49-85). In
        multi-process runs every host returns the GLOBAL outputs; the
        per-batch allgather is a collective, so every host must iterate
        the SAME number of batches (give each host an equal-length local
        shard of the dataset) or the cluster deadlocks."""
        chunks: Dict[str, List[np.ndarray]] = {}
        for batch in prefetch(iter(dataset)):
            out = self.eval_step(state, batch)
            for k, v in out.items():
                chunks.setdefault(k, []).append(self._fetch(v))
        return {k: np.concatenate(v, axis=0) for k, v in chunks.items()}

    def evaluate(self, state, dataset: Iterable) -> Dict[str, float]:
        """Validation metrics: val_loss (same loss fn on eval outputs) and
        val_auc over similarity/score vs label when available. Multi-process:
        the deferred fetches allgather per batch (collectives), so all hosts
        must supply the same number of eval batches or the cluster
        deadlocks."""
        from recommendflow_tpu.train.metrics import roc_auc
        losses, scores, labels = [], [], []
        try:
            loss_fn = self.model.resolve_loss()
        except (AttributeError, ValueError):
            loss_fn = None  # model computes its loss internally (ranking heads)
        # cache the jitted helpers across evaluate() calls (a fresh jax.jit
        # wrapper per call would retrace/recompile every epoch)
        if not hasattr(self, "_eval_loss_jit"):
            self._eval_loss_jit = jax.jit(loss_fn) if loss_fn is not None else None
            self._eval_sim_jit = jax.jit(lambda u, a: jnp.sum(u * a, axis=1))
        loss_jit = self._eval_loss_jit
        sim_jit = self._eval_sim_jit
        # dispatch ALL batches before fetching anything: a float()/np.asarray
        # inside the loop forces a device sync per batch (~30 ms round-trip
        # on tunneled platforms) and serializes host decode with device
        # compute — the same fix that took fit() from 8.4k to 93.2k ex/s
        for batch in prefetch(iter(dataset)):
            out = self.eval_step(state, batch)
            if "user" in out and "ad" in out:
                y, u, a = out["label"], out["user"], out["ad"]
                if loss_jit is not None:
                    losses.append(loss_jit(y, u, a))
                scores.append(sim_jit(u, a))
                labels.append(y)
            elif "score" in out:
                scores.append(jnp.ravel(out["score"]))
                labels.append(jnp.ravel(out["label"]))
        scores = [self._fetch(s) for s in scores]
        labels = [self._fetch(y) for y in labels]
        logs: Dict[str, float] = {}
        if losses:
            logs["val_loss"] = float(np.mean([float(x) for x in losses]))
        if scores:
            auc = roc_auc(np.concatenate(labels), np.concatenate(scores))
            if np.isfinite(auc):
                logs["val_auc"] = auc
        return logs

    def fit(self,
            train_ds: Dataset,
            epochs: int = 1,
            valid_ds: Optional[Dataset] = None,
            callbacks: Optional[List[Callback]] = None,
            log_every: int = 100,
            state: Optional[TrainState] = None,
            profile_dir: Optional[str] = None,
            profile_steps: Tuple[int, int] = (10, 15),
            resume_data: bool = True,
            preempt_dir: Optional[str] = None,
            preempt_window: int = 16,
            scan_steps: Optional[int] = None,
            verbose: bool = True) -> Dict[str, Any]:
        """scan_steps: steps fused into one lax.scan dispatch in the hot
        loop. None = auto (8 on accelerators — dispatch cost over remote
        links is the production bottleneck, measured 24.6 vs 33.0 ms/step
        interleaved on the v5e tunnel; 1 on CPU where dispatch is cheap and
        tests want step-granular behavior). Numerically identical to
        scan_steps=1: the scan threads the same per-step sequence, metrics
        are means over each chunk, state.step advances per inner step so
        resume/preemption semantics are unchanged (preemption lands on
        chunk boundaries, <= scan_steps steps late)."""
        callbacks = list(callbacks or [])
        history = History()
        callbacks.append(history)

        start_epoch, skip_batches = 0, 0
        if state is None:
            it = iter(train_ds)
            first = next(it)
            state = self.init_state(self._put(first))
        else:
            # step-level resume: skip past already-consumed batches of the
            # deterministic stream (SURVEY §5 data-iterator checkpointing)
            first, it = None, None
            if resume_data and int(state.step) > 0:
                try:
                    steps_per_epoch = len(train_ds)
                except TypeError:
                    steps_per_epoch = 0
                if steps_per_epoch:
                    done = int(state.step)
                    # done >= epochs*steps_per_epoch -> start_epoch == epochs
                    # and the loop is a no-op (a finished run resumes cleanly)
                    start_epoch = min(done // steps_per_epoch, epochs)
                    skip_batches = done % steps_per_epoch
                    if start_epoch or skip_batches:
                        log.info("resuming at epoch %d, batch %d (step %d)",
                                 start_epoch, skip_batches, done)
        # a previous fit()'s early-stop or an already-handled preemption must
        # not make this run train zero steps (control['lr_scale'] is kept on
        # purpose: ReduceLROnPlateau's LR carries into continued training,
        # matching Keras' persistent optimizer LR)
        self.control["stop"] = False
        self.control.pop("preempt", None)
        for cb in callbacks:
            cb.on_train_begin(self)

        lr_scale_applied = 1.0
        trace_active = False
        logs: Dict[str, float] = {}
        # multi-process runs must agree on the preemption stop step (see
        # _PreemptSync) — single-process keeps the zero-overhead local check.
        # preempt_window trades stop latency (the agreed stop lands that
        # many steps after the signal) against async pipeline depth (each
        # should_stop fetches the agreement dispatched `window` steps ago,
        # throttling dispatch to that depth)
        psync = _PreemptSync(window=preempt_window) \
            if jax.process_count() > 1 else None
        # per-host file sharding can hand hosts UNEQUAL batch counts; a
        # host that exhausts its local dataset first would issue epoch-top
        # collectives while the others still dispatch train-step
        # collectives — a straggler deadlock. Agree (once, a collective
        # every process reaches) on the cluster-min batches per epoch and
        # cap every host's epoch there.
        epoch_batch_cap = None
        if psync is not None and hasattr(train_ds, "__len__"):
            try:
                local_n = len(train_ds)
            except TypeError:
                local_n = -1
            from jax.experimental import multihost_utils
            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray(local_n, np.int64)))
            if (counts >= 0).all():
                epoch_batch_cap = int(counts.min())
                if counts.min() != counts.max():
                    log.warning(
                        "per-host batch counts differ %s; capping each "
                        "epoch at the cluster min %d to keep collectives "
                        "synchronized", counts.tolist(), epoch_batch_cap)
        # scan-K dispatch resolution (see the docstring). Multi-process runs
        # only chunk on explicit request: every host's dispatch sequence must
        # be identical chunk-for-chunk, so tails are dropped and the epoch
        # cap rounds down to a chunk multiple.
        devs = (list(self.mesh.devices.flat) if self.mesh is not None
                else jax.devices())
        on_accel = any(d.platform != "cpu" for d in devs)
        multiproc = jax.process_count() > 1
        if scan_steps is not None:
            k_scan = max(int(scan_steps), 1)
        else:
            k_scan = 8 if (on_accel and not multiproc) else 1
        drop_tail = multiproc and k_scan > 1
        if drop_tail and epoch_batch_cap is not None:
            rounded = (epoch_batch_cap // k_scan) * k_scan
            if rounded == 0:
                k_scan, drop_tail = 1, False  # dataset smaller than a chunk
            elif rounded != epoch_batch_cap:
                log.info("scan_steps=%d: epoch cap %d -> %d (chunk multiple)",
                         k_scan, epoch_batch_cap, rounded)
                epoch_batch_cap = rounded
        for epoch in range(start_epoch, epochs):
            if psync is not None:
                # agree on the epoch-top flags: a SIGTERM (or an
                # early-stopping decision made from per-host metrics) that
                # landed on ONE process between drain() and here would
                # otherwise make that host break while the others dispatch
                # next-epoch collectives — the straggler deadlock
                if psync.agree(bool(self.control["stop"])):
                    self.control["stop"] = True
                if psync.agree(bool(self.control.get("preempt"))):
                    self.control["preempt"] = True
            if self.control["stop"] or self.control.get("preempt"):
                break
            if self.control["lr_scale"] != lr_scale_applied:
                lr_scale_applied = self.control["lr_scale"]
                state = set_learning_rate(state, self.base_lr * lr_scale_applied)
                log.info("epoch %d: lr set to %.6g", epoch, self.base_lr * lr_scale_applied)

            t0 = time.time()
            n_batches, n_examples = 0, 0
            running: Dict[str, float] = {}
            if first is not None and epoch == start_epoch:
                raw_iter = _chain_first(first, it)
            elif epoch == start_epoch and skip_batches and hasattr(train_ds, "iter_from"):
                raw_iter = train_ds.iter_from(skip_batches, epoch=epoch)
            elif hasattr(train_ds, "iter_from"):
                # fold the epoch into the shuffle seed: each epoch sees a
                # different deterministic order (reshuffle-per-epoch parity
                # with tf.data), and resume can reproduce it
                raw_iter = train_ds.iter_from(0, epoch=epoch)
            else:
                raw_iter = iter(train_ds)
            if k_scan > 1:
                epoch_iter = prefetch(_chunk_stack(
                    raw_iter, k_scan, self._stack_batches, drop_tail))
            else:
                epoch_iter = prefetch(raw_iter)
            profiling = False
            for item in epoch_iter:
                if isinstance(item, tuple):
                    kind, payload, inc, inc_ex = item
                else:
                    kind, payload, inc = "batch", item, 1
                    inc_ex = _num_examples(item)
                if profile_dir is not None and epoch == 0:
                    # device trace over a steady-state step window (>=:
                    # chunked dispatch may jump past the exact step index)
                    if not profiling and not trace_active \
                            and n_batches >= profile_steps[0]:
                        jax.profiler.start_trace(profile_dir)
                        trace_active = profiling = True
                    elif trace_active and n_batches >= profile_steps[1]:
                        jax.profiler.stop_trace()
                        trace_active = False
                        log.info("profiler trace written to %s", profile_dir)
                if epoch_batch_cap is not None:
                    done_this_epoch = n_batches + (
                        skip_batches if epoch == start_epoch else 0)
                    if done_this_epoch + inc > epoch_batch_cap:
                        break  # cluster-min reached: stay in collective sync
                if psync is not None:
                    if psync.should_stop():
                        self.control["preempt"] = True
                        break
                elif self.control.get("preempt"):
                    break
                if kind == "chunk":
                    state, metrics = self._train_steps_stacked(state, payload)
                else:
                    state, metrics = self.train_step(state, payload)
                if psync is not None:
                    psync.push(bool(self.control.get("preempt")))
                n_batches += inc
                n_examples += inc_ex
                if n_batches % log_every < inc:
                    mvals = {k: float(v) for k, v in metrics.items()}
                    log.info("epoch %d step %d: %s", epoch, n_batches,
                             " ".join(f"{k}={v:.5f}" for k, v in mvals.items()))
                for k, v in metrics.items():
                    # accumulate device-side: float() would force a sync per
                    # step (~30 ms round-trip on tunneled platforms); chunk
                    # metrics are means over inc steps, so weight by inc
                    v = v * inc if inc > 1 else v
                    running[k] = running[k] + v if k in running else v
            if trace_active:
                # the epoch ended (or preemption broke the loop) before the
                # trace window closed — an open trace is lost AND poisons the
                # next start_trace in this process
                jax.profiler.stop_trace()
                trace_active = False
                log.info("profiler trace (short epoch) written to %s",
                         profile_dir)
            # fetch the accumulated metrics BEFORE stopping the epoch timer:
            # dispatch is async, so until this sync the device may still be
            # chewing through the tail of the epoch — timing dispatch alone
            # over-reported examples_per_sec ~5x on the tunnel (measured
            # 255k dispatch vs 49k synced)
            logs = {k: float(v) / max(n_batches, 1) for k, v in running.items()}
            dt = time.time() - t0
            logs["examples_per_sec"] = n_examples / max(dt, 1e-9)
            if psync is not None and psync.drain(
                    bool(self.control.get("preempt"))):
                # a straggler flag (signal landed inside the window or in the
                # epoch tail) — every process agrees here, so the collective
                # preempt save below runs on all of them
                self.control["preempt"] = True
            if self.control.get("preempt"):
                # checkpoint FIRST: a spot-VM grace window is seconds, not a
                # validation pass — skip eval + epoch callbacks and fall
                # through to the preempt save below immediately
                break
            if valid_ds is not None:
                logs.update(self.evaluate(state, valid_ds))
            for cb in callbacks:
                cb.on_epoch_end(self, state, epoch, logs)
            if "restore_state" in self.control:
                state = self.control.pop("restore_state")
            if verbose:
                print_table(
                    [[k, f"{v:.6g}"] for k, v in sorted(logs.items())],
                    headers=["metric", "value"],
                    title=f"Epoch {epoch} ({dt:.1f}s, {n_batches} steps)")
        if self.control.pop("preempt", False) and preempt_dir:
            # graceful preemption: the step counter inside `state` lets the
            # next fit() resume mid-epoch from exactly this batch
            from recommendflow_tpu.train.checkpoint import save_checkpoint
            save_checkpoint(preempt_dir, state, step=int(state.step))
            log.warning("preempted: checkpoint saved at step %d -> %s",
                        int(state.step), preempt_dir)
        for cb in callbacks:
            cb.on_train_end(self, state, logs)
        return {"state": state, "history": history.epochs}


def install_preemption_handler(trainer: "Trainer",
                               signals=None) -> None:
    """SIGTERM/SIGINT -> finish the in-flight step, checkpoint (fit's
    preempt_dir), exit the train loop cleanly. The reference has no in-train
    failure handling (SURVEY §5 — crashes resume manually from epoch files);
    here preemption resumes mid-epoch via the step-level data resume."""
    import signal as _signal
    sigs = signals if signals is not None else (_signal.SIGTERM,
                                                _signal.SIGINT)

    def handler(signum, frame):
        log.warning("signal %s: finishing current step, then checkpoint + "
                    "clean exit", signum)
        trainer.control["stop"] = True
        trainer.control["preempt"] = True

    for s in sigs:
        _signal.signal(s, handler)


def _chain_first(first, rest):
    yield first
    for x in rest:
        yield x


def _num_examples(batch) -> int:
    return len(next(iter(batch.values())))


def _chunk_stack(it, k: int, stack_fn, drop_tail: bool = False):
    """Group consecutive batches into stacked [k, B, ...] scan chunks;
    the tail (< k batches) falls back to single-step items so the scan jit
    never retraces for a ragged K. Runs inside the prefetch worker thread,
    so the np.stack memcpy overlaps device compute. Yields
    ('chunk', stacked, k, n_examples) or ('batch', batch, 1, n_examples).
    drop_tail: multi-process fit sets this so every host's item stream is
    all-chunks — per-host tail singles would desynchronize the per-step
    collectives across hosts with unequal local batch counts."""
    buf = []
    for b in it:
        buf.append(b)
        if len(buf) == k:
            n_ex = sum(_num_examples(x) for x in buf)
            yield ("chunk", stack_fn(buf), k, n_ex)
            buf = []
    if not drop_tail:
        for b in buf:
            yield ("batch", b, 1, _num_examples(b))
