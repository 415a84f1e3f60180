"""Model base: the framework contract every zoo model follows.

Reference contract (SURVEY §2.6; models/matching/dssm.py:11-64): constructor
takes (Configuration, loss, name); call(batch, training) adds the loss when
training and returns an embedding/label dict when predicting. Our TPU-native
translation: flax.linen modules whose __call__(batch, training) returns
  * training=True  -> (loss: scalar, aux: dict of metrics tensors)
  * training=False -> dict of outputs (embeddings / scores / labels)
Params and batch_stats live in standard flax collections; everything is
jit/pjit-safe with static shapes.

Models are loaded reflectively by dotted path 'pkg.module.Class' through
build_network (parity: backend/utils/model_utils.py:55-73) named in YAML
Networks.class.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.config.configuration import Configuration
from recommendflow_tpu.data.schema import BatchSchema, compile_schema
from recommendflow_tpu.ops.embedding import pool_sequence  # noqa: F401 (re-export)
from recommendflow_tpu.utils.str_parser import str2fn

Batch = Dict[str, jnp.ndarray]


class FeatureEmbedder(nn.Module):
    """Owns the stacked embedding tables; maps a batch to pooled per-feature
    embeddings (the linen twin of ops/embedding.py's functional engine —
    same stacked layout so the Pallas kernel and sharding rules apply)."""
    schema: BatchSchema

    def setup(self):
        from recommendflow_tpu.ops.embedding import init_group_table
        dtype = jnp.dtype(getattr(self.schema, "table_dtype", "float32"))
        tables = {}
        for dim, group in self.schema.groups.items():
            # shared init contract with the functional engine (packed
            # layout + pad-row zeroing + symmetric scale live in ONE place)
            tables[f"dim{dim}"] = self.param(
                f"table_dim{dim}",
                lambda key, _g=group: init_group_table(key, _g, dtype))
        vit = getattr(self.schema, "image_encoder", "linear") == "vit"
        image_encoders = {}
        for name in self.schema.order:
            slot = self.schema.slots[name]
            if slot.kind == "image":
                if vit:
                    # full ViT over patches (Networks image_encoder: vit);
                    # completes the reference's empty vit_encoder.py scaffold
                    from recommendflow_tpu.ops.transformer import ImageEncoder
                    image_encoders[name] = ImageEncoder(
                        out_dim=slot.dim, name=f"vit_{name}")
                else:
                    from recommendflow_tpu.ops.embedding import IMAGE_PATCH
                    patch_dim = IMAGE_PATCH * IMAGE_PATCH * 3
                    tables[f"img_{name}"] = self.param(
                        f"img_proj_{name}", nn.initializers.lecun_normal(),
                        (patch_dim, slot.dim), jnp.float32)
        self._image_encoders = image_encoders
        self._tables = tables

    def __call__(self, batch: Batch, tower: Optional[str] = None,
                 exclude=()) -> Dict[str, jnp.ndarray]:
        from recommendflow_tpu.ops.embedding import embed_batch
        out = embed_batch(self._tables, self.schema, batch, tower=tower,
                          exclude=exclude)
        for name, enc in self._image_encoders.items():
            slot = self.schema.slots[name]
            if tower is None or slot in self.schema.tower_slots(tower):
                out[name] = enc(batch[name].astype(jnp.float32))
        return out

    def unpooled(self, batch: Batch, name: str) -> jnp.ndarray:
        """One sparse feature's raw per-position embeddings [B, H, L, D]
        (for models that pool sequences themselves — pair with
        __call__(..., exclude=[name]) so the rows aren't gathered twice)."""
        from recommendflow_tpu.ops.embedding import _global_ids, gather_group
        slot = self.schema.slots[name]
        group = self.schema.groups[slot.dim]
        return gather_group(self._tables[f"dim{slot.dim}"], group,
                            _global_ids(self.schema, slot, batch[name]))

    def tower_vector(self, batch: Batch, tower: str) -> jnp.ndarray:
        from recommendflow_tpu.ops.embedding import concat_tower
        return concat_tower(self(batch, tower), self.schema, tower)

    def tower_vectors(self, batch: Batch, towers) -> List[jnp.ndarray]:
        """All towers' vectors from ONE fused gather pass.

        Per-tower tower_vector calls issue one take_rows per (tower, dim
        group); each take_rows backward is a separate full-table scatter
        fusion — the device trace showed two ~3.2 ms scatter passes per step
        on the bench two-tower (PERF.md). Embedding every tower in one call
        collapses them into one gather/scatter per dim group: -3.2 ms/step
        device time at bench scale."""
        from recommendflow_tpu.ops.embedding import concat_tower
        feats = self(batch)  # tower=None: every slot, one gather per group
        return [concat_tower(feats, self.schema, t) for t in towers]


class RecModel(nn.Module):
    """Base class: wires Configuration -> schema + loss resolution.

    ('name' is reserved by linen — flax auto-names submodules; the reference's
    name kwarg maps onto linen's module naming.)"""
    conf: Configuration
    loss: Any = None          # callable or dotted name; None -> Networks.loss

    # True on models whose forward reads embedding tables through exactly
    # ONE full-batch embed_batch pass (no per-tower embeds, no extra
    # unpooled() gathers): the trainer's split table-update path can then
    # gather rows outside the differentiated step (table_update='split',
    # train/trainer.py). A model with ANY other in-graph table read must
    # keep this False — its gradient contribution would be dropped.
    # (No type annotation: a plain class attribute, not a dataclass field.)
    row_injection = False

    @property
    def schema(self) -> BatchSchema:
        if not hasattr(self, "_schema_cache"):
            schema = compile_schema(self.conf.features)
            schema.table_dtype = str(
                self.conf.networks.get("table_dtype", "float32"))
            schema.image_encoder = str(
                self.conf.networks.get("image_encoder", "linear"))
            object.__setattr__(self, "_schema_cache", schema)
        return self._schema_cache

    def resolve_loss(self) -> Callable:
        loss = self.loss
        if loss is None:
            loss = self.conf.networks.get("loss")
        if loss is None:
            raise ValueError("no loss given (model arg or Networks.loss)")
        return str2fn(loss) if isinstance(loss, str) else loss

    def logq_correction(self, batch, update: bool = True):
        """Sampled-softmax bias correction inputs (BEYOND the reference,
        Yi et al. 2019): when `Networks.logq_feature` names a sparse item
        feature, maintain a streaming frequency estimate over its
        first-hash ids (a 'freq' variable collection the trainer threads
        through steps and checkpoints) and return the batch docs' log q
        for the loss's `logq=` parameter. Returns None when unconfigured.

        Call UNCONDITIONALLY from the model (models init with
        training=False, and the collection must exist at init for the
        trainer to thread it); pass update=training so only train steps
        advance the stream."""
        feat = self.network_conf("logq_feature")
        if not feat:
            return None
        import jax.numpy as jnp

        from recommendflow_tpu.train.freq import freq_init, freq_update, log_q
        buckets = int(self.network_conf("logq_buckets") or (1 << 20))
        alpha = float(self.network_conf("logq_alpha") or 0.05)
        ids = batch[feat].reshape(batch[feat].shape[0], -1)[:, 0] % buckets
        fstate = self.variable("freq", "state", lambda: freq_init(buckets))
        fstep = self.variable("freq", "step",
                              lambda: jnp.zeros((), jnp.int32))
        lq = log_q(fstate.value, ids)        # estimate BEFORE this batch
        if update and not self.is_initializing():
            fstep.value = fstep.value + 1
            fstate.value = freq_update(fstate.value, ids, fstep.value,
                                       alpha=alpha)
        return lq

    def token_max_len(self, default: int = 64) -> int:
        """Longest token feature in the schema — sizes TextEncoder.max_len
        so the encoder's length guard matches what the pipeline emits."""
        lens = [s.max_len for s in self.schema.slots.values()
                if s.kind in ("token", "bert")]
        return max(lens) if lens else default

    def network_conf(self, key: str, default=None):
        return self.conf.networks.get(key, default)


def build_network(class_path: str, model_kwargs: Dict[str, Any],
                  checkpoint_path: Optional[str] = None):
    """Reflection loader: 'recommendflow_tpu.models.matching.dssm.Dssm' ->
    instance (parity: model_utils.py:55-73). Short names resolve against the
    bundled zoo ('dssm' / 'matching.dssm.Dssm' / full path all work).
    Returns (model, restored_variables | None)."""
    path = class_path.strip()
    candidates = [path]
    if not path.startswith("recommendflow_tpu."):
        candidates += [f"recommendflow_tpu.models.{path}"]
        # bare model name: 'dssm' -> matching/ranking/... search
        if "." not in path:
            # snake_case -> CamelCase ('dssm_encoder' -> 'DssmEncoder');
            # a case-insensitive module scan below catches the rest
            # ('xdeepfm' -> XDeepFm)
            camel = "".join(p.capitalize() for p in path.lower().split("_"))
            for stage in ("matching", "preranking", "ranking", "reranking"):
                candidates.append(
                    f"recommendflow_tpu.models.{stage}.{path.lower()}.{camel}")
    # legacy reference paths: 'models.matching.dssm.Dssm'
    if path.startswith("models."):
        candidates.append("recommendflow_tpu." + path)

    last_err: Optional[Exception] = None
    for cand in candidates:
        module_name, _, cls_name = cand.rpartition(".")
        if not module_name:
            continue
        try:
            module = importlib.import_module(module_name)
        except ModuleNotFoundError as e:
            if e.name and (module_name == e.name
                           or module_name.startswith(e.name + ".")):
                last_err = e       # the candidate itself doesn't exist
                continue
            raise                  # the module EXISTS but its imports broke
        try:
            cls = getattr(module, cls_name)
        except AttributeError as e:
            # case-insensitive fallback: the module is right, the class
            # casing isn't ('xdeepfm' -> XDeepFm)
            matches = [v for k, v in vars(module).items()
                       if k.lower() == cls_name.lower()
                       and isinstance(v, type)]
            if not matches:
                last_err = e
                continue
            cls = matches[0]
        model = cls(**model_kwargs)
        restored = None
        if checkpoint_path:
            from recommendflow_tpu.train.checkpoint import restore_variables
            restored = restore_variables(checkpoint_path)
        return model, restored
    if "." not in path:
        # last resort for bare names: scan the zoo packages for a class
        # that doesn't live in a same-named module ('xdeepfm' -> XDeepFm
        # in ranking/deepfm.py)
        cls = _scan_zoo(path)
        if cls is not None:
            model = cls(**model_kwargs)
            restored = None
            if checkpoint_path:
                from recommendflow_tpu.train.checkpoint import (
                    restore_variables)
                restored = restore_variables(checkpoint_path)
            return model, restored
    raise ImportError(f"cannot resolve model class '{class_path}' "
                      f"(tried {candidates}): {last_err}")


def _scan_zoo(name: str):
    """Find a zoo class by case/underscore-insensitive bare name."""
    import pkgutil
    want = name.lower().replace("_", "")
    for stage in ("matching", "preranking", "ranking", "reranking"):
        pkg = importlib.import_module(f"recommendflow_tpu.models.{stage}")
        for info in pkgutil.iter_modules(pkg.__path__):
            mod = importlib.import_module(
                f"recommendflow_tpu.models.{stage}.{info.name}")
            for k, v in vars(mod).items():
                if (isinstance(v, type) and v.__module__ == mod.__name__
                        and k.lower().replace("_", "") == want):
                    return v
    return None
