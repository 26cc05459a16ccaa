"""bf16 fast path: decisions must agree with f32 on non-borderline inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from busca_tpu.models.busca import BuscaConfig, BuscaModel


import pytest

pytestmark = pytest.mark.slow  # heavy: training / full-size torch oracles


def test_bf16_argmax_agreement(rng):
    cfg32 = BuscaConfig(num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1))
    cfg16 = BuscaConfig(
        num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1),
        dtype="bfloat16",
    )
    m32, m16 = BuscaModel(cfg32), BuscaModel(cfg16)

    b, l, c, h, w = 4, 3, 2, 64, 32
    mem = jnp.asarray(rng.randn(b, l, h, w, 3).astype(np.float32))
    can = jnp.asarray(rng.randn(b, c, h, w, 3).astype(np.float32))
    bx = lambda n: jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 500, (b, n, 2)),
             rng.uniform(520, 800, (b, n, 2))], -1
        ).astype(np.float32)
    )
    mb, cb = bx(l), bx(c)
    variables = m32.init(jax.random.PRNGKey(0), mem, can, mb, cb)

    out32 = np.asarray(m32.apply(variables, mem, can, mb, cb))
    out16 = np.asarray(m16.apply(variables, mem, can, mb, cb))
    assert out16.dtype == np.float32  # logits come back f32 (decoder in f32)
    # decisions agree wherever f32 is not borderline (margin > typical bf16 noise)
    p32 = np.exp(out32) / np.exp(out32).sum(-1, keepdims=True)
    sorted_p = np.sort(p32, axis=-1)
    margin = sorted_p[:, -1] - sorted_p[:, -2]
    confident = margin > 0.05
    assert (
        out32.argmax(-1)[confident] == out16.argmax(-1)[confident]
    ).all()
    # and the probabilities stay close overall
    p16 = np.exp(out16) / np.exp(out16).sum(-1, keepdims=True)
    assert np.abs(p32 - p16).max() < 0.12
