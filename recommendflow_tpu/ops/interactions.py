"""Feature-interaction layers: FM family, CrossNetwork, CIN, residual units.

Parity: backend/layers/network_layers.py:8-255 (FM_Layer, FFM_Layer,
Residual_Units, CrossNetwork, New_FM, CIN). All are flax.linen modules over
dense [B, F, D] field-embedding tensors or [B, D] vectors — batched matmuls
that map straight onto the MXU (no per-field Python loops inside jit except
static smalls).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def fm_pairwise(emb: jnp.ndarray) -> jnp.ndarray:
    """Second-order FM interaction over field embeddings [B, F, D] ->
    [B] : 0.5 * sum((Σv)² − Σv²) (the classic square-of-sum trick)."""
    sum_sq = jnp.sum(emb, axis=1) ** 2
    sq_sum = jnp.sum(emb ** 2, axis=1)
    return 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1)


class FM(nn.Module):
    """First + second order factorization machine over pre-looked-up field
    embeddings (parity intent: network_layers.py:8-56 / 174-207 New_FM;
    the id-offset mapping is handled by the stacked-table engine).
    Optional field_values [B, F] scale each field's embedding (weighted FM
    for numeric-valued fields) before both terms."""
    @nn.compact
    def __call__(self, field_emb: jnp.ndarray,
                 field_values: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if field_values is not None:
            field_emb = field_emb * field_values[..., None]
        b, f, d = field_emb.shape
        first = nn.Dense(1, name="linear")(field_emb.reshape(b, f * d))[:, 0]
        second = fm_pairwise(field_emb)
        return first + second


class FFM(nn.Module):
    """Field-aware FM: per-field-pair latent vectors
    (parity: network_layers.py:59-106). O(F²) pairs, static F."""
    latent_dim: int = 8

    @nn.compact
    def __call__(self, field_emb: jnp.ndarray) -> jnp.ndarray:
        b, f, d = field_emb.shape
        # field-aware projections: each field gets F latent views
        w = self.param("field_latents", nn.initializers.normal(0.05),
                       (f, f, d, self.latent_dim))
        # v[i,j] = emb_i @ w[i,j]; score = sum_{i<j} v[i,j]·v[j,i]
        proj = jnp.einsum("bfd,fgdk->bfgk", field_emb, w)   # [B, F, F, K]
        inter = jnp.einsum("bfgk,bgfk->bfg", proj, proj)    # [B, F, F]
        iu = jnp.triu_indices(f, k=1)
        return jnp.sum(inter[:, iu[0], iu[1]], axis=-1)


class ResidualUnits(nn.Module):
    """Deep Crossing residual block (parity: network_layers.py:109-127)."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.relu(nn.Dense(self.hidden)(x))
        return nn.relu(nn.Dense(d)(h) + x)


class CrossNetwork(nn.Module):
    """DCN explicit crossing: x_{l+1} = x0 * (w·x_l) + b + x_l
    (parity: network_layers.py:130-171)."""
    num_layers: int = 3

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        d = x0.shape[-1]
        x = x0
        for i in range(self.num_layers):
            w = self.param(f"w{i}", nn.initializers.normal(0.05), (d, 1))
            b = self.param(f"b{i}", nn.initializers.zeros, (d,))
            xw = x @ w                     # [B, 1]
            x = x0 * xw + b + x
        return x


class CIN(nn.Module):
    """xDeepFM compressed interaction network
    (parity: network_layers.py:210-255, conv1d formulation -> einsum).

    Input [B, F, D]; each layer h^k = conv(outer(h^{k-1}, h^0)); output is
    the concat of per-layer sum-pooled feature maps. Width: with
    split_half=True (default), sum(s // 2 for non-final layers) + the last
    layer size (halves feed forward, halves pool out — the xDeepFM paper's
    variant); with split_half=False, sum(layer_sizes).

    The reference applies NO nonlinearity between layers (its conv1d output
    feeds the next layer raw, network_layers.py:249-251) and never splits;
    activation="linear" + split_half=False reproduces that exactly (oracle
    parity test). Defaults keep the xDeepFM-paper variant (relu + split).
    """
    layer_sizes: Sequence[int] = (128, 128)
    split_half: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(self, field_emb: jnp.ndarray) -> jnp.ndarray:
        b, f0, d = field_emb.shape
        h = field_emb
        outputs = []
        for li, size in enumerate(self.layer_sizes):
            fk = h.shape[1]
            # z: [B, Fk, F0, D] outer products along the embedding axis
            z = jnp.einsum("bfd,bgd->bfgd", h, field_emb)
            w = self.param(f"w{li}", nn.initializers.normal(0.05), (fk * f0, size))
            zf = z.reshape(b, fk * f0, d)
            h_next = jnp.einsum("bpd,ps->bsd", zf, w)      # [B, size, D]
            if self.activation == "relu":
                h_next = nn.relu(h_next)
            elif self.activation != "linear":
                raise ValueError(f"CIN activation '{self.activation}' "
                                 "(relu|linear)")
            if self.split_half and li != len(self.layer_sizes) - 1:
                half = size // 2
                direct, h = h_next[:, :half], h_next[:, half:]
            else:
                direct, h = h_next, h_next
            outputs.append(jnp.sum(direct, axis=-1))       # [B, half|size]
        return jnp.concatenate(outputs, axis=-1)
