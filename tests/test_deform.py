"""Deformable ops vs torch oracles (grid_sample MSDA; loop DCN)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from busca_tpu.ops.deform import (
    bilinear_sample,
    deform_conv2d,
    multi_scale_deformable_attention,
)


def test_bilinear_sample_matches_grid_sample(rng):
    h, w, c = 9, 13, 4
    img = rng.randn(h, w, c).astype(np.float32)
    xs = rng.uniform(-2, w + 1, (5, 7)).astype(np.float32)
    ys = rng.uniform(-2, h + 1, (5, 7)).astype(np.float32)
    got = np.asarray(
        bilinear_sample(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys))
    )
    # torch grid_sample, align_corners=False, zero padding
    grid_x = (xs + 0.5) / w * 2 - 1
    grid_y = (ys + 0.5) / h * 2 - 1
    grid = torch.from_numpy(np.stack([grid_x, grid_y], -1))[None]
    t_img = torch.from_numpy(img.transpose(2, 0, 1))[None]
    want = (
        F.grid_sample(t_img, grid, align_corners=False, padding_mode="zeros")
        .numpy()[0]
        .transpose(1, 2, 0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _msda_torch_oracle(value, shapes, locs, weights):
    """Pure-torch MSDA reference (grid_sample per level)."""
    b, _, heads, d = value.shape
    _, lq, _, levels, points, _ = locs.shape
    out = torch.zeros(b, lq, heads, d)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start : start + h * w].reshape(b, h, w, heads, d)
        start += h * w
        v = v.permute(0, 3, 4, 1, 2).reshape(b * heads, d, h, w)
        g = locs[:, :, :, lvl] * 2 - 1  # [B, Lq, H, P, 2] in [-1, 1]
        g = g.permute(0, 2, 1, 3, 4).reshape(b * heads, lq, points, 2)
        s = F.grid_sample(
            v, g, align_corners=False, padding_mode="zeros"
        )  # [B*H, d, Lq, P]
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3).reshape(
            b * heads, 1, lq, points
        )
        out += (
            (s * wgt).sum(-1).reshape(b, heads, d, lq).permute(0, 3, 1, 2)
        )
    return out.reshape(b, lq, heads * d)


def test_msda_matches_torch_oracle(rng):
    b, heads, d, lq, points = 2, 2, 8, 5, 3
    shapes = [(6, 8), (3, 4)]
    len_v = sum(h * w for h, w in shapes)
    value = rng.randn(b, len_v, heads, d).astype(np.float32)
    locs = rng.uniform(0, 1, (b, lq, heads, len(shapes), points, 2)).astype(
        np.float32
    )
    weights = rng.uniform(0, 1, (b, lq, heads, len(shapes), points)).astype(
        np.float32
    )
    weights /= weights.sum((-1, -2), keepdims=True)

    got = np.asarray(
        multi_scale_deformable_attention(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)
        )
    )
    want = _msda_torch_oracle(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locs),
        torch.from_numpy(weights),
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _dcn_loop_oracle(x, offset, weight, mask, stride, padding):
    """Naive python DCNv2 for a tiny case."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1

    def bil(img, yy, xx):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        fy, fx = yy - y0, xx - x0
        out = np.zeros(img.shape[-1])
        for ddy, wy in ((0, 1 - fy), (1, fy)):
            for ddx, wx in ((0, 1 - fx), (1, fx)):
                py, px = y0 + ddy, x0 + ddx
                if 0 <= py < img.shape[0] and 0 <= px < img.shape[1]:
                    out += wy * wx * img[py, px]
        return out

    out = np.zeros((b, ho, wo, cout))
    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                acc = np.zeros(cout)
                for iy in range(kh):
                    for ix in range(kw):
                        tap = iy * kw + ix
                        dy = offset[bi, oy, ox, 2 * tap]
                        dx = offset[bi, oy, ox, 2 * tap + 1]
                        sy = oy * stride - padding + iy + dy
                        sx = ox * stride - padding + ix + dx
                        v = bil(x[bi], sy, sx)
                        m = mask[bi, oy, ox, tap] if mask is not None else 1.0
                        acc += (v * m) @ weight[iy, ix]
                out[bi, oy, ox] = acc
    return out


def test_deform_conv_matches_loop_oracle(rng):
    b, h, w, cin, cout, k = 1, 6, 7, 3, 4, 3
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offset = (rng.randn(b, h, w, 2 * k * k) * 0.7).astype(np.float32)
    weight = rng.randn(k, k, cin, cout).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)

    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
            jnp.asarray(mask), stride=1, padding=1,
        )
    )
    want = _dcn_loop_oracle(x, offset, weight, mask, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # zero offsets + unit mask == plain convolution
    got_plain = np.asarray(
        deform_conv2d(
            jnp.asarray(x),
            jnp.zeros((b, h, w, 2 * k * k), jnp.float32),
            jnp.asarray(weight),
            jnp.ones((b, h, w, k * k), jnp.float32),
        )
    )
    t = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(np.ascontiguousarray(weight.transpose(3, 2, 0, 1))),
        stride=1,
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got_plain, t, rtol=1e-3, atol=1e-4)


def test_local_modulated_conv_equals_zero_offset_dcn(rng):
    """sampling="local" == exact DCNv2 with offsets pinned to the grid."""
    import jax.numpy as jnp

    from busca_tpu.ops.deform import deform_conv2d, local_modulated_conv2d

    x = jnp.asarray(rng.randn(2, 9, 11, 6).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, 6, 5).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 9, 11, 9).astype(np.float32))
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    zero_off = jnp.zeros((2, 9, 11, 18), jnp.float32)
    a = deform_conv2d(x, zero_off, weight, mask, bias, stride=1, padding=1)
    b = local_modulated_conv2d(x, weight, mask, bias, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_centertrack_local_sampling_runs(rng):
    """The sampling="local" CenterTrack net runs with the SAME param tree
    as the deformable default (the offset conv stays in the tree)."""
    import jax
    import jax.numpy as jnp

    from busca_tpu.models.centertrack import (
        CenterTrackConfig, CenterTrackNet,
    )

    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    cfg_d = CenterTrackConfig.tiny()
    cfg_l = CenterTrackConfig.tiny(sampling="local")
    net_d = CenterTrackNet(cfg_d)
    net_l = CenterTrackNet(cfg_l)
    v_d = jax.jit(net_d.init)(jax.random.PRNGKey(0), x, x, x[..., :1])
    v_l = jax.jit(net_l.init)(jax.random.PRNGKey(0), x, x, x[..., :1])
    td = jax.tree_util.tree_structure(v_d)
    tl = jax.tree_util.tree_structure(v_l)
    assert td == tl  # local mode keeps checkpoint compatibility
    out = net_l.apply(v_d, x, x, x[..., :1])
    assert set(out) == {"hm", "reg", "wh", "tracking"}
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_lma_pallas_tap_sum_matches_reference(rng, monkeypatch):
    """Pallas local tap-sum (interpret mode on CPU) == direct formulation.

    Shapes chosen so h4 is NOT a multiple of TILE_R (exercises the row
    padding) and heads_pb > 1 (exercises the head->lane expansion matmul).
    """
    import jax
    import jax.experimental.pallas as pl

    from busca_tpu.ops import lma_pallas

    orig = pl.pallas_call
    monkeypatch.setattr(
        lma_pallas.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    levels, h4, w4, c, heads = 3, 20, 24, 64, 4
    dils = (1, 2, 4)
    vals = jnp.asarray(rng.randn(levels, h4, w4, c).astype(np.float32))
    wts = jnp.asarray(rng.rand(h4, w4, heads, levels * 9).astype(np.float32))
    with jax.disable_jit():
        got = lma_pallas.local_tap_sum(vals, wts, dils, heads)
    want = lma_pallas.local_tap_sum_reference(vals, wts, dils)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_windowed_dcn_matches_exact_within_window(rng):
    """deform_conv2d_windowed == deform_conv2d when |offset| <= window,
    and == deform_conv2d(clip(offset)) beyond (the documented clamp)."""
    from busca_tpu.ops.deform import deform_conv2d_windowed

    b, h, w, cin, cout, k, W = 1, 6, 7, 3, 4, 3, 2
    x = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(k, k, cin, cout).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    # strictly inside the window -> exact equality with the gather path
    off_in = (rng.uniform(-W, W, (b, h, w, 2 * k * k)) * 0.99).astype(
        np.float32)
    got = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(off_in), jnp.asarray(weight),
        jnp.asarray(mask), jnp.asarray(bias), window=W))
    want = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(off_in), jnp.asarray(weight),
        jnp.asarray(mask), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # beyond the window -> equals the exact path with clipped offsets
    off_big = (rng.randn(b, h, w, 2 * k * k) * 4.0).astype(np.float32)
    got = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(off_big), jnp.asarray(weight),
        jnp.asarray(mask), jnp.asarray(bias), window=W))
    want = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(np.clip(off_big, -W, W)),
        jnp.asarray(weight), jnp.asarray(mask), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # zero offsets + windowed == plain local mode
    from busca_tpu.ops.deform import local_modulated_conv2d

    got0 = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.zeros((b, h, w, 2 * k * k), jnp.float32),
        jnp.asarray(weight), jnp.asarray(mask), jnp.asarray(bias),
        window=W))
    want0 = np.asarray(local_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(weight), jnp.asarray(mask),
        jnp.asarray(bias)))
    np.testing.assert_allclose(got0, want0, rtol=1e-4, atol=1e-5)
