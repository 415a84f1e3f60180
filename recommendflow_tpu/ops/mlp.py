"""MLP blocks and activations (parity: backend/blocks/mlp.py:4-29).

flax.linen modules; BatchNorm state rides the standard 'batch_stats'
collection. Dice (DIN's adaptive activation) included.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp


def dice(x: jnp.ndarray, axis: int = 0, alpha: float = 0.0,
         eps: float = 1e-9) -> jnp.ndarray:
    """Dice activation (DIN; reference dice_func, mlp.py:24-29):
    p·x + alpha·(1−p)·x with p = sigmoid of the BATCH-standardized input.
    This functional form uses the current batch's statistics and a fixed
    alpha; use the `Dice` module for the learnable-alpha variant."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    p = nn.sigmoid((x - mean) / jnp.sqrt(var + eps))
    return p * x + alpha * (1.0 - p) * x


class Dice(nn.Module):
    """DIN Dice with learnable per-feature alpha and BatchNorm statistics
    (running stats at inference), matching the reference's construction."""
    epsilon: float = 1e-9

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        normed = nn.BatchNorm(use_running_average=not training,
                              use_bias=False, use_scale=False,
                              epsilon=self.epsilon)(x)
        p = nn.sigmoid(normed)
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        return p * x + alpha * (1.0 - p) * x


_ACTIVATIONS = {
    "relu": nn.relu, "selu": nn.selu, "gelu": nn.gelu, "elu": nn.elu,
    # erf gelu — what Google-BERT checkpoints were trained with (the plain
    # "gelu" above is flax's tanh approximation, == HF "gelu_new")
    "gelu_exact": lambda x: nn.gelu(x, approximate=False),
    "tanh": jnp.tanh, "sigmoid": nn.sigmoid, "silu": nn.silu,
    "leaky_relu": nn.leaky_relu, "dice": dice, "linear": lambda x: x,
    "none": lambda x: x,
}


def get_activation(name: Union[str, Callable]) -> Callable:
    if callable(name):
        return name
    if name.lower() not in _ACTIVATIONS:
        raise ValueError(f"unknown activation '{name}'; have {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[name.lower()]


class MLP(nn.Module):
    """[norm -> dense -> activation -> dropout] x len(units).

    Parity with create_mlp (blocks/mlp.py:4-15): optional BatchNorm before
    each dense, dropout after activation, final layer optionally linear.
    """
    units: Sequence[int]
    dropout: float = 0.0
    activation: str = "relu"
    use_bn: bool = False
    bn_epsilon: float = 1e-6
    final_activation: Optional[str] = None   # None -> same as activation
    compute_dtype: Optional[str] = None      # e.g. 'bfloat16': MXU-friendly
    # activations/matmuls in bf16 while params stay f32; output cast back

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = get_activation(self.activation)
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if dtype is not None:
            x = x.astype(dtype)
        n = len(self.units)
        for i, width in enumerate(self.units):
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not training,
                                 epsilon=self.bn_epsilon, momentum=0.99,
                                 dtype=dtype)(x)
            x = nn.Dense(width, dtype=dtype)(x)
            if i == n - 1 and self.final_activation is not None:
                x = get_activation(self.final_activation)(x)
            else:
                x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x.astype(jnp.float32) if dtype is not None else x


class ExpertsMLP(nn.Module):
    """E parallel expert MLPs evaluated as ONE batched computation.

    TPU-native expert form: instead of a Python loop of per-expert modules
    (E small matmuls), parameters carry a leading expert axis [E, ...]
    (nn.vmap) and all experts run as single batched matmuls on the MXU.
    Because the expert dimension is a real array axis, a mesh axis can
    shard it — expert parallelism: with params placed P('ep', ...) (see
    parallel/mesh.py:expert_sharding_rules), XLA partitions the batched
    matmuls across chips and the only collective is the all-gather/psum at
    the gates' mixture contraction. Output: [B, E, units[-1]].
    """
    num_experts: int
    units: Sequence[int]
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        vmapped = nn.vmap(
            MLP,
            in_axes=None, out_axes=1,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            axis_size=self.num_experts)
        return vmapped(list(self.units), self.dropout, self.activation,
                       name="experts")(x, training)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
