"""Pretrained BERT checkpoint import into the flax TextEncoder.

Capability parity with the reference's pretrained-weight path: bert4keras
`build_transformer_model(config_path, checkpoint_path)` (backend/blocks/
bert.py:11-33) and the base/cosent/sbert weight-loading modes of BertEncoder
(backend/encoder/bert_encoder.py:254-281). The reference consumes Google-TF
BERT checkpoints (`bert_model.ckpt` variable naming); this converter reads
that format via `tf.train.load_checkpoint` AND the HuggingFace torch
state-dict format (`pytorch_model.bin` / `.safetensors`), normalizes both to
one canonical name space, and rebuilds the flax param tree of
ops/transformer.py:TextEncoder.

Everything TF/torch is imported lazily — the module costs nothing unless a
pretrained load is requested.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "bert_encoder_kwargs", "load_bert_checkpoint", "bert_params_to_flax",
    "load_pretrained_text_encoder", "graft_params", "apply_pretrained",
]

# HF hidden_act -> our activation-table names (ops/mlp.py:_ACTIVATIONS).
# "gelu" -> erf gelu: this matches HF BERT AND bert4keras (whose default is
# gelu_erf) — i.e. the reference's serving behavior. Google's original TF1
# modeling.py used the tanh approximation, so bert4keras itself serves TF
# checkpoints with the same ~1e-3 activation delta we do; parity target is
# bert4keras (blocks/bert.py:11), not TF1. "gelu_new" is the tanh form
# (flax's default nn.gelu).
_ACT_MAP = {"gelu": "gelu_exact", "gelu_new": "gelu", "gelu_python":
            "gelu_exact", "relu": "relu", "silu": "silu", "swish": "silu"}


def bert_encoder_kwargs(config_path: str, max_len: Optional[int] = None,
                        **overrides) -> Dict[str, Any]:
    """bert_config.json -> TextEncoder constructor kwargs.

    `max_len` clips the positional table (standard practice when serving
    shorter sequences than max_position_embeddings); overrides win last.
    """
    with open(config_path) as f:
        cfg = json.load(f)
    pos_max = int(cfg.get("max_position_embeddings", 512))
    kwargs: Dict[str, Any] = dict(
        vocab_size=int(cfg["vocab_size"]),
        num_layers=int(cfg.get("num_hidden_layers", 12)),
        model_dim=int(cfg.get("hidden_size", 768)),
        num_heads=int(cfg.get("num_attention_heads", 12)),
        ffn_hidden=int(cfg.get("intermediate_size", 4 * cfg.get("hidden_size", 768))),
        max_len=min(pos_max, max_len) if max_len else pos_max,
        dropout=float(cfg.get("hidden_dropout_prob", 0.1)),
        type_vocab_size=int(cfg.get("type_vocab_size", 2)),
        pos_type="learned",
        ln_epsilon=float(cfg.get("layer_norm_eps", 1e-12)),
        ffn_activation=_ACT_MAP.get(str(cfg.get("hidden_act", "gelu")), "gelu_exact"),
    )
    kwargs.update(overrides)
    return kwargs


# ----------------------------------------------------------------- readers
def _canon(name: str) -> str:
    """Normalize a TF-variable or torch-state-dict name to canonical form:
    'embeddings/word_embeddings', 'encoder/layer_0/attention/self/query/kernel'.
    """
    n = name.replace(".", "/")
    n = re.sub(r"^(bert|electra|roberta)/", "", n)
    n = re.sub(r"/layer/(\d+)/", r"/layer_\1/", n)   # torch 'layer.0.'
    n = n.replace("/gamma", "/scale").replace("/beta", "/bias")
    return n


def _read_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import tensorflow as tf  # noqa: lazily imported, baked into the image
    reader = tf.train.load_checkpoint(path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        if "adam" in name.lower() or "global_step" in name or "optimizer" in name:
            continue  # training slots in released checkpoints
        key = _canon(name)
        arr = np.asarray(reader.get_tensor(name))
        # TF dense kernels are [in, out] == flax layout; LayerNorm
        # gamma/beta already renamed by _canon. No transposes needed.
        if key.endswith("/kernel") or "embeddings" in key or key.endswith(("/scale", "/bias")):
            out[key] = arr
    return out


def _read_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # optional dependency
        raw = load_file(path)
        items = raw.items()
    else:
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        items = ((k, v.detach().numpy()) for k, v in raw.items())
    out = {}
    for name, arr in items:
        key = _canon(name)
        arr = np.asarray(arr)
        if key.endswith("/weight"):
            if arr.ndim == 2 and "embeddings" not in key:
                # torch Linear weight [out, in] -> flax kernel [in, out]
                out[key[:-len("/weight")] + "/kernel"] = arr.T
            elif arr.ndim == 1:  # LayerNorm weight
                out[key[:-len("/weight")] + "/scale"] = arr
            else:                # embedding tables
                out[key[:-len("/weight")]] = arr
        else:
            out[key] = arr       # '/bias' and friends pass through
    return out


def load_bert_checkpoint(checkpoint_path: str) -> Dict[str, np.ndarray]:
    """Read a BERT checkpoint into {canonical name: np.ndarray}.

    Accepts a Google-TF checkpoint prefix (`.../bert_model.ckpt`, the
    bert4keras input format — blocks/bert.py:11) or a torch state-dict file
    (`pytorch_model.bin` / `model.safetensors`).
    """
    if checkpoint_path.endswith((".bin", ".pt", ".pth", ".safetensors")):
        return _read_torch_state_dict(checkpoint_path)
    if (os.path.exists(checkpoint_path + ".index")
            or os.path.isdir(checkpoint_path)
            or ".ckpt" in os.path.basename(checkpoint_path)):
        return _read_tf_checkpoint(checkpoint_path)
    raise FileNotFoundError(
        f"cannot identify checkpoint format at '{checkpoint_path}' — expected "
        "a TF checkpoint prefix (with .index alongside) or a torch "
        ".bin/.pt/.safetensors file")


# --------------------------------------------------------------- converter
def _take(weights: Dict[str, np.ndarray], key: str) -> np.ndarray:
    if key not in weights:
        raise KeyError(
            f"pretrained checkpoint is missing '{key}' — have "
            f"{sorted(k for k in weights if '/layer_' not in k)} (+ layer vars)")
    return weights[key]


def bert_params_to_flax(weights: Dict[str, np.ndarray], *, num_layers: int,
                        max_len: int, num_heads: int) -> Dict[str, Any]:
    """Canonical BERT weights -> TextEncoder 'params' tree.

    Target layout (ops/transformer.py:TextEncoder with pos_type='learned'):
    tok_emb/seg_emb embeddings, pos_emb table, emb_ln, then per block
    mha.{q,k,v,out} + ln1 + ffn.{Dense_0,Dense_1} + ln2.
    """
    e = "embeddings/"
    params: Dict[str, Any] = {
        "tok_emb": {"embedding": _take(weights, e + "word_embeddings")},
        "seg_emb": {"embedding": _take(weights, e + "token_type_embeddings")},
        "pos_emb": _take(weights, e + "position_embeddings")[:max_len],
        "emb_ln": {"scale": _take(weights, e + "LayerNorm/scale"),
                   "bias": _take(weights, e + "LayerNorm/bias")},
    }
    dim = params["tok_emb"]["embedding"].shape[1]
    if dim % num_heads:
        raise ValueError(f"hidden size {dim} not divisible by {num_heads} heads")
    for i in range(num_layers):
        L = f"encoder/layer_{i}/"

        def dense(sub):
            return {"kernel": _take(weights, L + sub + "/kernel"),
                    "bias": _take(weights, L + sub + "/bias")}

        def ln(sub):
            return {"scale": _take(weights, L + sub + "/scale"),
                    "bias": _take(weights, L + sub + "/bias")}

        params[f"block{i}"] = {
            "mha": {"q": dense("attention/self/query"),
                    "k": dense("attention/self/key"),
                    "v": dense("attention/self/value"),
                    "out": dense("attention/output/dense")},
            "ln1": ln("attention/output/LayerNorm"),
            "ffn": {"Dense_0": dense("intermediate/dense"),
                    "Dense_1": dense("output/dense")},
            "ln2": ln("output/LayerNorm"),
        }
    return params


def load_pretrained_text_encoder(config_path: str, checkpoint_path: str,
                                 max_len: Optional[int] = None,
                                 **encoder_overrides) -> Tuple[Any, Dict[str, Any]]:
    """(config json, checkpoint) -> (TextEncoder module, variables).

    The bert4keras `build_transformer_model(config_path, checkpoint_path)`
    replacement (reference blocks/bert.py:11-15). `encoder_overrides` set
    pooling/out_layer/pool_pos etc. without affecting weight loading.
    """
    from recommendflow_tpu.ops.transformer import TextEncoder
    kwargs = bert_encoder_kwargs(config_path, max_len=max_len,
                                 **encoder_overrides)
    weights = load_bert_checkpoint(checkpoint_path)
    params = bert_params_to_flax(weights, num_layers=kwargs["num_layers"],
                                 max_len=kwargs["max_len"],
                                 num_heads=kwargs["num_heads"])
    model = TextEncoder(**kwargs)
    return model, {"params": params}


# ------------------------------------------------------------ model grafts
def graft_params(params, module_name: str, sub_params, path: str = ""):
    """Replace the subtree `params[...][module_name]` with `sub_params`.

    Searches recursively so it works regardless of how deep the encoder
    module sits in the model; raises if the name never appears or a leaf
    shape disagrees (a silent shape mismatch would train garbage).
    """
    import jax

    found = []

    def walk(tree, prefix):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == module_name:
                _check_shapes(v, sub_params, prefix + "/" + k)
                out[k] = jax.tree.map(
                    lambda old, new: np.asarray(new, dtype=old.dtype)
                    if hasattr(old, "dtype") else new, v, sub_params)
                found.append(prefix + "/" + k)
            else:
                out[k] = walk(v, prefix + "/" + k)
        return out

    import flax.core as flax_core
    was_frozen = isinstance(params, flax_core.FrozenDict)
    result = walk(flax_core.unfreeze(params) if was_frozen else dict(params),
                  path)
    if not found:
        raise KeyError(f"no module named '{module_name}' in the param tree")
    return flax_core.freeze(result) if was_frozen else result


def _check_shapes(old, new, where: str):
    import jax
    old_shapes = jax.tree.map(lambda x: tuple(getattr(x, "shape", ())), old)
    new_shapes = jax.tree.map(lambda x: tuple(getattr(x, "shape", ())), new)
    if old_shapes != new_shapes:
        raise ValueError(
            f"pretrained params do not match module '{where}': model has "
            f"{old_shapes}, checkpoint gives {new_shapes} — configure the "
            "model from the same bert_config.json (bert_encoder_kwargs)")


def apply_pretrained(model, params):
    """Graft every pretrained encoder named under `Networks.pretrained`
    into a freshly-initialized param tree (trainer init hook).

    YAML surface (the reference's `bert_conf`/`user_bert_conf` parity,
    dssm_bert.py:30-38):

        Networks:
          pretrained:
            encoder:        {config_path: ..., checkpoint_path: ...}
            user_encoder:   {config_path: ..., checkpoint_path: ...}
    """
    conf = getattr(model, "conf", None)
    networks = getattr(conf, "networks", None) or {}
    specs = networks.get("pretrained") if isinstance(networks, dict) else None
    if not specs:
        return params
    # positional-table clipping must agree with how the model sized its
    # encoder (models default max_len to token_max_len())
    default_len = (model.token_max_len()
                   if hasattr(model, "token_max_len") else None)
    for module_name, spec in specs.items():
        _, variables = load_pretrained_text_encoder(
            spec["config_path"], spec["checkpoint_path"],
            max_len=spec.get("max_len") or default_len)
        params = graft_params(params, module_name, variables["params"])
    return params
