"""Numerics parity of the Flax Transformer encoder vs torch modules.

The torch oracle is assembled here from stock ``torch.nn`` building blocks
(MultiheadAttention + LayerNorm + Linear in post-LN arrangement, matching the
published BUSCA architecture).  Weights are copied torch -> flax and outputs
compared, which also exercises the torch-layout parameter convention used by
the checkpoint converter.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from busca_tpu.models.transformer import (
    MultiHeadSelfAttention,
    TransformerEncoder,
    get_activation,
)

D, H, FF, L, B = 512, 4, 1024, 25, 3


def _np(t):
    return t.detach().cpu().numpy()


def test_mhsa_matches_torch(rng):
    x = rng.randn(B, L, D).astype(np.float32)

    t_mha = tnn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
    t_mha.eval()
    with torch.no_grad():
        t_out, t_w = t_mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            average_attn_weights=False,
        )

    model = MultiHeadSelfAttention(D, H, dropout=0.0)
    params = {
        "in_proj_weight": jnp.asarray(_np(t_mha.in_proj_weight)),
        "in_proj_bias": jnp.asarray(_np(t_mha.in_proj_bias)),
        "out_proj": {
            "weight": jnp.asarray(_np(t_mha.out_proj.weight)),
            "bias": jnp.asarray(_np(t_mha.out_proj.bias)),
        },
    }
    out, w = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _np(t_out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), _np(t_w), rtol=1e-4, atol=1e-5)


class _TorchPostLNLayer(tnn.Module):
    """Post-LN encoder block: the published BUSCA layer arrangement."""

    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
        self.linear1 = tnn.Linear(D, FF)
        self.linear2 = tnn.Linear(FF, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)
        self.act = tnn.GELU()

    def forward(self, src):
        a, w = self.self_attn(src, src, src, average_attn_weights=False)
        src = self.norm1(src + a)
        f = self.linear2(self.act(self.linear1(src)))
        src = self.norm2(src + f)
        return src, w


def _convert_layer(t_layer):
    return {
        "self_attn": {
            "in_proj_weight": jnp.asarray(_np(t_layer.self_attn.in_proj_weight)),
            "in_proj_bias": jnp.asarray(_np(t_layer.self_attn.in_proj_bias)),
            "out_proj": {
                "weight": jnp.asarray(_np(t_layer.self_attn.out_proj.weight)),
                "bias": jnp.asarray(_np(t_layer.self_attn.out_proj.bias)),
            },
        },
        "linear1": {
            "weight": jnp.asarray(_np(t_layer.linear1.weight)),
            "bias": jnp.asarray(_np(t_layer.linear1.bias)),
        },
        "linear2": {
            "weight": jnp.asarray(_np(t_layer.linear2.weight)),
            "bias": jnp.asarray(_np(t_layer.linear2.bias)),
        },
        "norm1": {
            "scale": jnp.asarray(_np(t_layer.norm1.weight)),
            "bias": jnp.asarray(_np(t_layer.norm1.bias)),
        },
        "norm2": {
            "scale": jnp.asarray(_np(t_layer.norm2.weight)),
            "bias": jnp.asarray(_np(t_layer.norm2.bias)),
        },
    }


def test_encoder_stack_matches_torch(rng):
    torch.manual_seed(3)
    n_layers = 4
    t_layers = [_TorchPostLNLayer() for _ in range(n_layers)]
    for tl in t_layers:
        tl.eval()

    x = rng.randn(B, L, D).astype(np.float32)
    with torch.no_grad():
        t_out = torch.from_numpy(x)
        t_weights = []
        for tl in t_layers:
            t_out, w = tl(t_out)
            t_weights.append(w)

    model = TransformerEncoder(
        num_layers=n_layers, d_model=D, nhead=H, dim_feedforward=FF,
        dropout=0.0, activation=get_activation("gelu"),
    )
    params = {
        f"layers_{i}": _convert_layer(t_layers[i]) for i in range(n_layers)
    }
    out, weights = model.apply(
        {"params": params}, jnp.asarray(x), True, True
    )
    np.testing.assert_allclose(
        np.asarray(out), _np(t_out), rtol=1e-3, atol=1e-4
    )
    for wj, wt in zip(weights, t_weights):
        np.testing.assert_allclose(
            np.asarray(wj), _np(wt), rtol=1e-3, atol=1e-4
        )


@pytest.mark.slow
def test_encoder_initializes_and_jits(rng):
    model = TransformerEncoder(
        num_layers=2, d_model=64, nhead=4, dim_feedforward=128, dropout=0.1
    )
    x = jnp.asarray(rng.randn(2, 25, 64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: model.apply(p, x))
    y1 = f(params, x)
    y2 = f(params, x)
    assert y1.shape == (2, 25, 64)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
