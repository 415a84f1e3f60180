"""Text encoding service: tokenizer + flax TextEncoder + whitening + cache.

Capability parity with the reference's BertEncoder (backend/encoder/
bert_encoder.py:32-283): batch text -> embedding with pooling position and
output-layer selection, optional BERT-whitening auto-fit on the first batch,
LRU-cached online encode (OnnxEncoder.encode parity, onnx_utils.py:102-137).
The remote bert-serving path (bert_encoder.py:79-117) is provided by
recommendflow_tpu.serving: cli/serve.py hosts this service over HTTP and
serving.client.RemoteEncoderClient is the remote-with-local-fallback client.
"""
from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from recommendflow_tpu.encoder.tokenizer import Tokenizer
from recommendflow_tpu.ops.transformer import TextEncoder
from recommendflow_tpu.retrieval.whitening import VecsWhitening


class TextEncoderService:
    def __init__(self,
                 tokenizer: Tokenizer,
                 model: Optional[TextEncoder] = None,
                 variables=None,
                 max_len: int = 64,
                 batch_size: int = 256,
                 use_whitening: bool = False,
                 whitening_dim: Optional[int] = None,
                 cache_size: int = 100_000,
                 seed: int = 0,
                 **model_kwargs):
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.batch_size = batch_size
        if model is not None and model_kwargs:
            # silently dropping construction options when a model instance
            # is supplied would serve the checkpoint's defaults (e.g. a
            # from_pretrained pooling= kwarg vanishing without a trace)
            raise TypeError(
                f"model instance given together with construction kwargs "
                f"{sorted(model_kwargs)} — configure the model itself (for "
                "from_pretrained use pool_pos/out_layer)")
        model_kwargs.setdefault("max_len", max_len)
        self.model = model or TextEncoder(vocab_size=len(tokenizer.vocab),
                                          **model_kwargs)
        if variables is None:
            import jax.numpy as jnp
            dummy = jnp.zeros((1, max_len), jnp.int32)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy, dummy)
        self.variables = variables
        self.use_whitening = use_whitening
        self.whitening = VecsWhitening(whitening_dim) if use_whitening else None
        self._whitening_fit = False
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self.cache_size = cache_size
        self._encode_fn = jax.jit(
            lambda v, tok, seg: self.model.apply(v, tok, seg))

    # --------------------------------------------------------- pretrained
    @classmethod
    def from_pretrained(cls, config_path: str, checkpoint_path: str,
                        dict_path: str, model_name: str = "base",
                        model_weights_path: Optional[str] = None,
                        max_len: int = 64,
                        pool_pos=None, out_layer: Optional[int] = None,
                        **kwargs) -> "TextEncoderService":
        """Build a service around a pretrained BERT checkpoint.

        Parity with the reference's load_encoder modes (backend/encoder/
        bert_encoder.py:223-283): `model_name='base'` loads the raw
        checkpoint (optionally overlaid with finetuned weights);
        'cosent'/'sbert' REQUIRE `model_weights_path` — a directory written
        by TextEncoderService.save after finetuning (the sbert classifier
        head lives outside the encoder, so restoring the encoder subtree is
        the whole load). `pool_pos` accepts an int position or 'avg'/'max'
        (load_encoder's surface, bert_encoder.py:225-230); `out_layer`
        selects the nth block's output.
        """
        from recommendflow_tpu.encoder.pretrained import (
            bert_encoder_kwargs, load_pretrained_text_encoder)
        enc_kwargs: dict = {}
        if pool_pos is not None:
            if isinstance(pool_pos, str):
                if pool_pos not in ("avg", "max", "cls", "sum"):
                    raise ValueError(f"pool_pos not support: {pool_pos}")
                enc_kwargs["pooling"] = pool_pos
            else:
                # bound by the ACTUAL sequence length the encoder will see,
                # not the checkpoint's max_position_embeddings
                n_pos = bert_encoder_kwargs(config_path,
                                            max_len=max_len)["max_len"]
                if not 0 <= int(pool_pos) < n_pos:
                    raise ValueError(
                        f"pool_pos scalar must in [0, {n_pos}), get {pool_pos}")
                enc_kwargs.update(pooling="pos", pool_pos=int(pool_pos))
        if out_layer is not None:
            n_layers = bert_encoder_kwargs(config_path)["num_layers"]
            if not -n_layers <= int(out_layer) < n_layers:
                raise ValueError(
                    f"out_layer must be an int in [-{n_layers}, "
                    f"{n_layers})")
            enc_kwargs["out_layer"] = int(out_layer)
        if model_name.lower() not in ("base", "cosent", "sbert"):
            raise ValueError(f"unsupported model_name='{model_name}'")
        if model_name.lower() != "base" and not model_weights_path:
            raise ValueError(
                f"model_name='{model_name}' requires model_weights_path "
                "(a directory written by TextEncoderService.save)")
        model, variables = load_pretrained_text_encoder(
            config_path, checkpoint_path, max_len=max_len, **enc_kwargs)
        service = cls(Tokenizer(dict_path), model=model, variables=variables,
                      max_len=model.max_len, **kwargs)
        if model_weights_path:
            service.load_weights(model_weights_path)
        return service

    # ------------------------------------------------------------- encode
    def _encode_raw(self, texts: Sequence[str]) -> np.ndarray:
        # bounded pipeline: keep a few chunks in flight (host tokenization
        # of chunk i+1 overlaps device compute of chunk i) but fetch the
        # oldest once the window fills — unbounded dispatch would hold
        # EVERY per-chunk output buffer in HBM until the final concat
        # (60 GB of outputs for a 20M-text corpus on a 16 GB chip)
        window = 4
        pending: List[Tuple[Any, int]] = []
        done: List[np.ndarray] = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start:start + self.batch_size])
            # pad the chunk to the full batch for one stable jit shape
            pad_n = self.batch_size - len(chunk)
            tok, seg = self.tokenizer.encode_batch(
                chunk + [""] * pad_n, self.max_len)
            pending.append((self._encode_fn(self.variables, tok, seg),
                            len(chunk)))
            if len(pending) >= window:
                emb, n = pending.pop(0)
                done.append(np.asarray(emb)[:n])
        done.extend(np.asarray(emb)[:n] for emb, n in pending)
        return np.concatenate(done, axis=0)

    def warmup(self) -> None:
        """Compile the encode path before accepting traffic WITHOUT
        touching the LRU cache or triggering the whitening auto-fit (a
        warmup dummy must never become the whitening statistics)."""
        self._encode_raw(["warmup"])

    def encode(self, texts: Sequence[str], normalize: bool = True) -> np.ndarray:
        """LRU-cached batch encode (OnnxEncoder.encode parity:
        onnx_utils.py:123-137). Whitening auto-fits on the first call when
        enabled (bert_encoder.py:160-182 behavior)."""
        if isinstance(texts, (str, bytes)):
            # a bare string satisfies Sequence[str] and would silently
            # encode CHARACTER BY CHARACTER
            raise TypeError("encode() takes a list of texts — wrap the "
                            "single text in a list")
        if len(texts) == 0:
            if self.use_whitening and self._whitening_fit:
                dim = self.whitening.kernel.shape[1]
            elif self.use_whitening and self.whitening is not None \
                    and self.whitening.n_components:
                # not yet fit, but the configured whitening_dim IS the
                # width every non-empty result will have
                dim = self.whitening.n_components
            else:
                dim = self.model.model_dim
            return np.zeros((0, dim), np.float32)
        # snapshot the cached rows this call needs BEFORE any insertion:
        # inserting at capacity evicts LRU entries, which may include them
        have: Dict[str, np.ndarray] = {}
        for t in texts:
            if t not in have and t in self._cache:
                have[t] = self._cache[t]
                self._cache.move_to_end(t)
        missing = [t for t in texts if t not in have]
        fresh: Dict[str, np.ndarray] = {}
        if missing:
            uniq = list(dict.fromkeys(missing))
            embs = self._encode_raw(uniq)
            if self.use_whitening:
                if not self._whitening_fit:
                    if len(embs) < 2:
                        # np.cov of one sample is NaN -> SVD crash; and a
                        # tiny fit batch would silently poison every later
                        # embedding with junk statistics
                        raise ValueError(
                            "whitening auto-fit needs >= 2 texts on the "
                            "first encode call (got "
                            f"{len(embs)}); encode a representative batch "
                            "first, load fitted stats, or use warmup()")
                    self.whitening.fit(embs)
                    self._whitening_fit = True
                embs = self.whitening.transform(embs, normalize=False)
            # keep this call's results OUT of the eviction's reach: inserting
            # at capacity pops LRU entries, which may include texts this very
            # call still has to return (or earlier uniq entries when
            # len(uniq) > cache_size)
            fresh = dict(zip(uniq, embs))
            for t, e in fresh.items():
                if self.cache_size <= 0:
                    break  # caching disabled
                if t not in self._cache and len(self._cache) >= self.cache_size:
                    self._cache.popitem(last=False)
                self._cache[t] = e
        out = np.stack([fresh[t] if t in fresh else have[t] for t in texts])
        if normalize:
            out = out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out

    # ------------------------------------------------------------ persist
    def __getstate__(self):
        """Pickle support (the reference pickles whole searchers including
        their encoder, faiss_searcher.py:217-225): drop the jitted closure,
        host-copy the variables."""
        import jax.numpy as jnp
        state = self.__dict__.copy()
        state["_encode_fn"] = None
        state["variables"] = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x,
            self.variables)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._encode_fn = jax.jit(
            lambda v, tok, seg: self.model.apply(v, tok, seg))

    def save(self, directory: str):
        from recommendflow_tpu.train.checkpoint import save_pytree
        os.makedirs(directory, exist_ok=True)
        save_pytree(os.path.join(directory, "variables"), self.variables)
        if self.whitening is not None and self._whitening_fit:
            self.whitening.save(os.path.join(directory, "whitening.npz"))

    def load_weights(self, directory: str):
        from recommendflow_tpu.train.checkpoint import restore_pytree
        self.variables = restore_pytree(os.path.join(directory, "variables"),
                                        self.variables)
        # embeddings cached under the OLD weights would silently mix two
        # incompatible embedding spaces into one output matrix
        self._cache.clear()
        wpath = os.path.join(directory, "whitening.npz")
        if os.path.exists(wpath):
            self.whitening = VecsWhitening.load(wpath)
            self._whitening_fit = True
            self.use_whitening = True
        elif self.use_whitening and self._whitening_fit:
            # statistics fit on the OLD embedding space must not whiten
            # the new weights' embeddings — refit on the next encode
            self.whitening = VecsWhitening(self.whitening.n_components)
            self._whitening_fit = False
        return self
