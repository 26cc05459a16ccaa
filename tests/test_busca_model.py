"""End-to-end parity of BuscaModel (+ checkpoint converter) vs a torch oracle.

The oracle composes the published pipeline from torch primitives: GHOST
ResNet-50 (train-mode BN) -> shared linear x sqrt(d) -> token assembly
(MEM-SEP-CAN-BAD) -> 3-D sinusoid positional encodings -> post-LN Transformer
stack -> LayerNorm+Linear decoder over CAN positions.  The torch weights are
exported in the *reference checkpoint key layout* and pushed through
``convert_busca_state_dict``, so this also validates the converter end to end.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from busca_tpu.models.busca import BuscaConfig, BuscaModel, can_token_positions
from busca_tpu.models.convert import convert_busca_state_dict, merge_params

from torch_oracles import (
    TorchGhostResNet50,
    TorchPostLNLayer,
    oracle_pe3d,
    oracle_spatial_buckets,
)

B, L_MEM, C, D = 2, 5, 3, 512
H, W = 96, 32  # small crops keep the CPU oracle fast
N_LAYERS = 2
FF = 1024
NHEAD = 4


class _TorchBusca(tnn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(42)
        self.reid = TorchGhostResNet50(num_classes=7, layers_cfg=(1, 1, 1, 1))
        self.encoder = tnn.Linear(D, D)
        self.layers = tnn.ModuleList(
            [TorchPostLNLayer(D, NHEAD, FF) for _ in range(N_LAYERS)]
        )
        self.dec_norm = tnn.LayerNorm(D)
        self.dec_lin = tnn.Linear(D, 1)
        self.sep_token = tnn.Parameter(torch.randn(D))
        self.non_token = tnn.Parameter(torch.randn(D))
        self.bad_token = tnn.Parameter(torch.randn(D))

    def reference_state_dict(self):
        sd = dict(self.reid.reference_state_dict())
        for k, v in self.encoder.state_dict().items():
            sd[f"encoder.{k}"] = v.numpy()
        for i, layer in enumerate(self.layers):
            for k, v in layer.state_dict().items():
                sd[f"transformer_encoder.layers.{i}.{k}"] = v.numpy()
        sd["decoder.0.weight"] = self.dec_norm.weight.detach().numpy()
        sd["decoder.0.bias"] = self.dec_norm.bias.detach().numpy()
        sd["decoder.1.weight"] = self.dec_lin.weight.detach().numpy()
        sd["decoder.1.bias"] = self.dec_lin.bias.detach().numpy()
        sd["sep_token"] = self.sep_token.detach().numpy()
        sd["non_token"] = self.non_token.detach().numpy()
        sd["bad_token"] = self.bad_token.detach().numpy()
        return sd

    @torch.no_grad()
    def forward(self, mem_crops, can_crops, mem_bboxes, can_bboxes):
        """mem_crops [B,L,H,W,3] RGB normalized, boxes ltrb."""
        self.reid.train()  # batch-stat BN

        def feats(crops):
            b, l = crops.shape[:2]
            flat = torch.from_numpy(
                crops.reshape(b * l, H, W, 3).transpose(0, 3, 1, 2)
            ).float()
            _, f = self.reid(flat)
            return f.reshape(b, l, -1)

        mem = self.encoder(feats(mem_crops)) * np.sqrt(D)
        can = self.encoder(feats(can_crops)) * np.sqrt(D)

        sep = self.sep_token.expand(B, 1, D)
        groups = [can[:, i : i + 1] for i in range(C)]
        groups += [self.non_token.expand(B, 1, D), self.bad_token.expand(B, 1, D)]
        seq = [mem]
        for g in groups:
            seq += [sep, g]
        x = torch.cat(seq, dim=1)

        # positional encodings via the numpy oracle
        ref = mem_bboxes[:, -1:, :]
        # memory tokens
        mem_xy, mem_sz = oracle_spatial_buckets(mem_bboxes, ref)
        mem_t = np.tile(
            np.clip(np.arange(-L_MEM + 1, 1) * 2, -30, 30) + 30, (B, 1)
        )
        # candidate token bboxes: [ref, can_i]*C + [ref, ref] + [fake, fake]
        fmin = np.finfo(np.float32).min
        fake = np.array([fmin, fmin, -fmin / 100, -fmin / 100])  # ltwh-as-ltrb
        tok_boxes = []
        for i in range(C):
            tok_boxes += [ref[:, 0], can_bboxes[:, i]]
        tok_boxes += [ref[:, 0], ref[:, 0], np.tile(fake, (B, 1)), np.tile(fake, (B, 1))]
        tok_boxes = np.stack(tok_boxes, axis=1)
        can_xy, can_sz = oracle_spatial_buckets(tok_boxes, ref)
        can_t = np.tile(np.tile([32, 34], C + 2), (B, 1))

        pe_mem = oracle_pe3d(mem_xy, mem_sz, mem_t, D).astype(np.float16)
        pe_can = oracle_pe3d(can_xy, can_sz, can_t, D).astype(np.float16)
        pe = np.concatenate([pe_mem, pe_can], axis=1).astype(np.float32)
        x = x + torch.from_numpy(pe)

        for layer in self.layers:
            x, _ = layer(x)

        pos = list(can_token_positions(L_MEM, C + 2, "MEM-SEP-CAN-BAD"))
        out = x[:, pos]
        return self.dec_lin(self.dec_norm(out))[..., 0]


def _random_ltrb(rng, *shape):
    xy = rng.uniform(0, 800, size=shape + (2,))
    wh = rng.uniform(5, 300, size=shape + (2,))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


@pytest.mark.slow
def test_busca_model_matches_torch_oracle(rng):
    oracle = _TorchBusca()

    mem_crops = rng.randn(B, L_MEM, H, W, 3).astype(np.float32)
    can_crops = rng.randn(B, C, H, W, 3).astype(np.float32)
    mem_boxes = _random_ltrb(rng, B, L_MEM)
    can_boxes = _random_ltrb(rng, B, C)

    want = oracle.forward(mem_crops, can_crops, mem_boxes, can_boxes).numpy()

    cfg = BuscaConfig(num_layer=N_LAYERS, reid_num_classes=7, reid_layers=(1, 1, 1, 1))
    model = BuscaModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(mem_crops),
        jnp.asarray(can_crops),
        jnp.asarray(mem_boxes),
        jnp.asarray(can_boxes),
    )
    converted = convert_busca_state_dict(
        oracle.reference_state_dict(), ignore_reid_fc=False
    )
    params = merge_params(variables["params"], converted["params"])

    got = model.apply(
        {"params": params},
        jnp.asarray(mem_crops),
        jnp.asarray(can_crops),
        jnp.asarray(mem_boxes),
        jnp.asarray(can_boxes),
    )
    got = np.asarray(got)
    assert got.shape == (B, C + 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # Softmax decisions must agree exactly.
    assert (got.argmax(-1) == want.argmax(-1)).all()


@pytest.mark.slow
def test_padded_lanes_do_not_change_real_scores(rng):
    cfg = BuscaConfig(num_layer=N_LAYERS, reid_num_classes=7, reid_layers=(1, 1, 1, 1))
    model = BuscaModel(cfg)
    mem_crops = rng.randn(B, L_MEM, H, W, 3).astype(np.float32)
    can_crops = rng.randn(B, C, H, W, 3).astype(np.float32)
    mem_boxes = _random_ltrb(rng, B, L_MEM)
    can_boxes = _random_ltrb(rng, B, C)
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(mem_crops),
        jnp.asarray(can_crops),
        jnp.asarray(mem_boxes),
        jnp.asarray(can_boxes),
    )
    real = model.apply(
        {"params": variables["params"]},
        jnp.asarray(mem_crops),
        jnp.asarray(can_crops),
        jnp.asarray(mem_boxes),
        jnp.asarray(can_boxes),
        jnp.ones((B,)),
    )

    # Pad to twice the batch with garbage, masked out.
    pad = lambda a: np.concatenate([a, 50 * np.abs(a).max() * np.ones_like(a)])
    mask = np.concatenate([np.ones(B), np.zeros(B)]).astype(np.float32)
    padded = model.apply(
        {"params": variables["params"]},
        jnp.asarray(pad(mem_crops)),
        jnp.asarray(pad(can_crops)),
        jnp.asarray(pad(mem_boxes)),
        jnp.asarray(pad(can_boxes)),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(padded)[:B], np.asarray(real), rtol=1e-3, atol=1e-4
    )


def test_can_token_positions_cls_shift():
    """CLS- flavours prepend one token; CAN positions shift by one
    (busca/network.py:117-122, 138-148)."""
    base = can_token_positions(L_MEM, C + 2, "MEM-SEP-CAN-BAD")
    cls = can_token_positions(L_MEM, C + 2, "CLS-MEM-SEP-CAN-BAD")
    assert cls == tuple(p + 1 for p in base)
    base2 = can_token_positions(L_MEM, C + 2, "MEM-CAN-SEP-BAD")
    cls2 = can_token_positions(L_MEM, C + 2, "CLS-MEM-CAN-SEP-BAD")
    assert cls2 == tuple(p + 1 for p in base2)


def test_cls_positional_encoding_matches_last_memory_token():
    """The CLS token encodes the reference bbox at temporal id 0 — exactly
    the last memory token's buckets (busca/encodings.py:56-60 intent)."""
    from busca_tpu.models import encodings

    r = np.random.RandomState(3)
    mem_boxes = _random_ltrb(r, B, L_MEM)
    can_boxes = _random_ltrb(r, B, C)
    mem_pe, can_pe = encodings.positional_encodings(
        jnp.asarray(mem_boxes), jnp.asarray(can_boxes), D,
        "CLS-MEM-SEP-CAN-BAD",
    )
    mem_pe = np.asarray(mem_pe)
    assert mem_pe.shape == (B, L_MEM + 1, D)
    np.testing.assert_array_equal(mem_pe[:, 0], mem_pe[:, -1])
    # candidate tokens are unaffected by the CLS prefix
    base_mem_pe, base_can_pe = encodings.positional_encodings(
        jnp.asarray(mem_boxes), jnp.asarray(can_boxes), D,
        "MEM-SEP-CAN-BAD",
    )
    np.testing.assert_array_equal(np.asarray(can_pe), np.asarray(base_can_pe))
    np.testing.assert_array_equal(mem_pe[:, 1:], np.asarray(base_mem_pe))


def test_cls_flavour_forward():
    """A CLS-flavoured model runs, has a cls_token param, and produces the
    same [B, C+2] logit shape; the extra token changes attention context so
    logits differ from the non-CLS layout."""
    cfg = BuscaConfig(
        num_layer=N_LAYERS, reid_num_classes=7, reid_layers=(1, 1, 1, 1),
        input_flavour="CLS-MEM-SEP-CAN-BAD",
    )
    model = BuscaModel(cfg)
    r = np.random.RandomState(5)
    mem_crops = r.randn(B, L_MEM, H, W, 3).astype(np.float32)
    can_crops = r.randn(B, C, H, W, 3).astype(np.float32)
    mem_boxes = _random_ltrb(r, B, L_MEM)
    can_boxes = _random_ltrb(r, B, C)
    variables = model.init(
        jax.random.PRNGKey(2),
        jnp.asarray(mem_crops), jnp.asarray(can_crops),
        jnp.asarray(mem_boxes), jnp.asarray(can_boxes),
    )
    assert "cls_token" in variables["params"]
    logits = model.apply(
        {"params": variables["params"]},
        jnp.asarray(mem_crops), jnp.asarray(can_crops),
        jnp.asarray(mem_boxes), jnp.asarray(can_boxes),
    )
    assert np.asarray(logits).shape == (B, C + 2)
    assert np.isfinite(np.asarray(logits)).all()
