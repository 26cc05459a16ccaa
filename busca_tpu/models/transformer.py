"""Attention-exposing Transformer encoder (Flax) with torch-compatible numerics.

The reference re-implements ``nn.TransformerEncoder{,Layer}`` solely so that
per-layer attention weights can be returned (busca/custom_layers.py:9-70):
post-LN residual blocks around a standard multi-head self-attention with a
*packed* qkv projection.  This module reproduces those numerics exactly
(same parameter shapes and layouts as torch, so checkpoint conversion is a
set of transposes) while being a single fused XLA computation.

Parameter layout (torch convention, weight ``[out, in]``, ``y = x W^T + b``):
- ``self_attn.in_proj_weight``  ``[3d, d]``, ``in_proj_bias`` ``[3d]``
- ``self_attn.out_proj.{weight,bias}``
- ``linear1/linear2.{weight,bias}`` (FF), ``norm1/norm2.{scale,bias}``
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def _torch_linear(x, w, b=None):
    """torch ``nn.Linear`` semantics: ``x @ w.T + b`` with ``w [out, in]``."""
    y = x @ w.T
    if b is not None:
        y = y + b
    return y


class TorchLinear(nn.Module):
    """Linear layer storing weights in torch ``[out, in]`` layout."""

    features_in: int
    features_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.features_out, self.features_in),
            self.dtype,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), self.dtype
        )
        return _torch_linear(x, w, b)


class MultiHeadSelfAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` (self-attention, batch_first) numerics.

    Packed qkv projection, scaling by ``1/sqrt(head_dim)``, per-head attention
    weights returned (``average_attn_weights=False`` — custom_layers.py:32-34).
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d, h = self.d_model, self.nhead
        head_dim = d // h
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d),
            self.dtype,
        )
        in_proj_b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * d,), self.dtype
        )
        qkv = _torch_linear(x, in_proj_w, in_proj_b)  # [B, L, 3d]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        b, l = x.shape[0], x.shape[1]

        def split_heads(t):  # [B, L, d] -> [B, h, L, head_dim]
            return t.reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        weights = nn.softmax(logits, axis=-1)  # [B, h, L, L]
        attn_weights = weights
        weights = nn.Dropout(rate=self.dropout)(
            weights, deterministic=deterministic
        )
        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        out = TorchLinear(d, d, dtype=self.dtype, name="out_proj")(ctx)
        return out, attn_weights


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder block (busca/custom_layers.py:30-41)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, deterministic: bool = True):
        attn_out, weights = MultiHeadSelfAttention(
            self.d_model, self.nhead, self.dropout, self.dtype,
            name="self_attn",
        )(src, deterministic)
        src = src + nn.Dropout(rate=self.dropout)(
            attn_out, deterministic=deterministic
        )
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)

        ff = TorchLinear(
            self.d_model, self.dim_feedforward, dtype=self.dtype, name="linear1"
        )(src)
        act = self.activation if self.activation is not None else gelu_exact
        ff = act(ff)
        ff = nn.Dropout(rate=self.dropout)(ff, deterministic=deterministic)
        ff = TorchLinear(
            self.dim_feedforward, self.d_model, dtype=self.dtype, name="linear2"
        )(ff)
        src = src + nn.Dropout(rate=self.dropout)(
            ff, deterministic=deterministic
        )
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
        return src, weights


class TransformerEncoder(nn.Module):
    """Stack of encoder layers, returning per-layer attention maps."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, src, deterministic: bool = True, return_att: bool = False
    ):
        weights = []
        out = src
        for i in range(self.num_layers):
            out, w = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                self.dtype,
                name=f"layers_{i}",
            )(out, deterministic)
            weights.append(w)
        if return_att:
            return out, weights
        return out


def gelu_exact(x):
    """Exact erf GELU (torch ``nn.GELU()`` default; jax defaults to tanh approx)."""
    import jax

    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": gelu_exact,
    "tanh": jnp.tanh,
    "silu": nn.silu,
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(
            f"activation should be one of {sorted(ACTIVATIONS)}, not {name!r}"
        )
    return ACTIVATIONS[name]
