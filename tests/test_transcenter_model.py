"""TransCenter detector: decode oracle, PVTv2 torch parity, and the 2-frame
stateful detector<->tracker feedback loop (reference models/transcenter.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from busca_tpu.eval.detector import TransCenterDetector
from busca_tpu.models.transcenter import (
    PVTv2Stage,
    TransCenterConfig,
    TransCenterDETR,
    generic_decode,
    render_prior_heatmap,
)


# ------------------------------ generic_decode ------------------------------

def test_generic_decode_known_peaks():
    h, w, c, k = 8, 10, 1, 4
    hm = np.full((1, h, w, c), 0.01, np.float32)
    # two clean peaks
    hm[0, 2, 3, 0] = 0.9
    hm[0, 6, 7, 0] = 0.7
    reg = np.zeros((1, h, w, 2), np.float32)
    reg[0, 2, 3] = [0.25, -0.25]
    wh = np.zeros((1, h, w, 2), np.float32)
    wh[0, 2, 3] = [4.0, 2.0]
    wh[0, 6, 7] = [2.0, 6.0]
    out = {
        "hm": jnp.asarray(hm),
        "reg": jnp.asarray(reg),
        "wh": jnp.asarray(wh),
        "tracking": jnp.zeros((1, h, w, 2)),
    }
    d = jax.tree_util.tree_map(np.asarray, generic_decode(out, k=k))
    assert d["scores"][0, 0] == pytest.approx(0.9)
    assert d["scores"][0, 1] == pytest.approx(0.7)
    # cx = 3 + 0.25, cy = 2 - 0.25, box = cts +- wh/2
    np.testing.assert_allclose(
        d["bboxes"][0, 0], [3.25 - 2, 1.75 - 1, 3.25 + 2, 1.75 + 1], atol=1e-6
    )
    np.testing.assert_allclose(d["bboxes"][0, 1], [6, 3, 8, 9], atol=1e-6)
    assert (d["clses"][0, :2] == 0).all()


def test_generic_decode_peak_nms_suppresses_neighbors():
    h, w = 8, 8
    hm = np.full((1, h, w, 1), 0.01, np.float32)
    hm[0, 4, 4, 0] = 0.9
    hm[0, 4, 5, 0] = 0.8  # adjacent, not a 3x3 max -> must be suppressed
    out = {
        "hm": jnp.asarray(hm),
        "reg": jnp.zeros((1, h, w, 2)),
        "wh": jnp.ones((1, h, w, 2)),
        "tracking": jnp.zeros((1, h, w, 2)),
    }
    d = jax.tree_util.tree_map(np.asarray, generic_decode(out, k=3))
    assert d["scores"][0, 0] == pytest.approx(0.9)
    assert d["scores"][0, 1] < 0.8  # the 0.8 neighbor was zeroed


def test_render_prior_heatmap():
    hm = render_prior_heatmap(np.array([[3.0, 5.0]]), (10, 12))
    assert hm.shape == (10, 12, 1)
    assert hm[5, 3, 0] == pytest.approx(1.0)
    assert hm[5, 3, 0] > hm[5, 6, 0] > 0.0
    assert (render_prior_heatmap(None, (4, 4)) == 0).all()


# ----------------------------- PVTv2 torch parity ---------------------------

@pytest.mark.slow
def test_pvtv2_stage_matches_torch_oracle(rng):
    """One PVTv2 stage (overlap patch embed + SR attention + MixFFN) against
    a torch oracle of the published architecture, params copied over."""
    import torch
    import torch.nn as tnn

    dim, heads, sr, ratio = 16, 2, 2, 2

    class TStage(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, 7, 4, 3)
            self.norm0 = tnn.LayerNorm(dim)
            self.norm1 = tnn.LayerNorm(dim)
            self.q = tnn.Linear(dim, dim)
            self.sr = tnn.Conv2d(dim, dim, sr, sr)
            self.sr_norm = tnn.LayerNorm(dim)
            self.kv = tnn.Linear(dim, 2 * dim)
            self.attn_proj = tnn.Linear(dim, dim)
            self.norm2 = tnn.LayerNorm(dim)
            self.fc1 = tnn.Linear(dim, dim * ratio)
            self.dw = tnn.Conv2d(dim * ratio, dim * ratio, 3, 1, 1,
                                 groups=dim * ratio)
            self.fc2 = tnn.Linear(dim * ratio, dim)
            self.norm3 = tnn.LayerNorm(dim)

        def forward(self, x):  # x [B, 3, H, W]
            x = self.proj(x)
            b, c, h, w = x.shape
            t = x.flatten(2).transpose(1, 2)  # [B, N, C]
            t = self.norm0(t)
            # SRA
            y = self.norm1(t)
            q = self.q(y).reshape(b, -1, heads, c // heads).transpose(1, 2)
            xr = y.transpose(1, 2).reshape(b, c, h, w)
            xr = self.sr(xr).reshape(b, c, -1).transpose(1, 2)
            xr = self.sr_norm(xr)
            k, v = self.kv(xr).chunk(2, dim=-1)
            k = k.reshape(b, -1, heads, c // heads).transpose(1, 2)
            v = v.reshape(b, -1, heads, c // heads).transpose(1, 2)
            a = (q @ k.transpose(-2, -1)) / np.sqrt(c // heads)
            a = a.softmax(-1)
            o = (a @ v).transpose(1, 2).reshape(b, -1, c)
            t = t + self.attn_proj(o)
            # MixFFN
            y = self.norm2(t)
            y = self.fc1(y)
            yr = y.transpose(1, 2).reshape(b, dim * ratio, h, w)
            y = self.dw(yr).flatten(2).transpose(1, 2)
            y = tnn.functional.gelu(y)
            t = t + self.fc2(y)
            t = self.norm3(t)
            return t.transpose(1, 2).reshape(b, c, h, w)

    torch.manual_seed(0)
    oracle = TStage().eval()

    stage = PVTv2Stage(dim, heads, 1, ratio, sr, patch=7, stride=4)
    x = rng.randn(1, 16, 24, 3).astype(np.float32)
    variables = stage.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def conv_w(t):  # torch OIHW -> flax HWIO
        return np.asarray(t.detach()).transpose(2, 3, 1, 0)

    def lin_w(t):  # torch [out, in] -> flax [in, out]
        return np.asarray(t.detach()).T

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p["embed"]["proj"]["kernel"] = conv_w(oracle.proj.weight)
    p["embed"]["proj"]["bias"] = np.asarray(oracle.proj.bias.detach())
    p["embed"]["norm"]["scale"] = np.asarray(oracle.norm0.weight.detach())
    p["embed"]["norm"]["bias"] = np.asarray(oracle.norm0.bias.detach())
    p["norm1_0"]["scale"] = np.asarray(oracle.norm1.weight.detach())
    p["norm1_0"]["bias"] = np.asarray(oracle.norm1.bias.detach())
    a = p["attn_0"]
    a["q"]["kernel"] = lin_w(oracle.q.weight)
    a["q"]["bias"] = np.asarray(oracle.q.bias.detach())
    a["sr"]["kernel"] = conv_w(oracle.sr.weight)
    a["sr"]["bias"] = np.asarray(oracle.sr.bias.detach())
    a["sr_norm"]["scale"] = np.asarray(oracle.sr_norm.weight.detach())
    a["sr_norm"]["bias"] = np.asarray(oracle.sr_norm.bias.detach())
    a["kv"]["kernel"] = lin_w(oracle.kv.weight)
    a["kv"]["bias"] = np.asarray(oracle.kv.bias.detach())
    a["proj"]["kernel"] = lin_w(oracle.attn_proj.weight)
    a["proj"]["bias"] = np.asarray(oracle.attn_proj.bias.detach())
    p["norm2_0"]["scale"] = np.asarray(oracle.norm2.weight.detach())
    p["norm2_0"]["bias"] = np.asarray(oracle.norm2.bias.detach())
    f = p["ffn_0"]
    f["fc1"]["kernel"] = lin_w(oracle.fc1.weight)
    f["fc1"]["bias"] = np.asarray(oracle.fc1.bias.detach())
    f["dwconv"]["kernel"] = np.asarray(
        oracle.dw.weight.detach()
    ).transpose(2, 3, 1, 0)  # [O,1,kh,kw] -> [kh,kw,1,O]
    f["dwconv"]["bias"] = np.asarray(oracle.dw.bias.detach())
    f["fc2"]["kernel"] = lin_w(oracle.fc2.weight)
    f["fc2"]["bias"] = np.asarray(oracle.fc2.bias.detach())
    p["norm"]["scale"] = np.asarray(oracle.norm3.weight.detach())
    p["norm"]["bias"] = np.asarray(oracle.norm3.bias.detach())

    got = np.asarray(stage.apply({"params": p}, jnp.asarray(x)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = np.asarray(want).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


# --------------------------- stateful detector loop -------------------------

TINY = TransCenterConfig.tiny()
TEST_SIZE = (32, 48)


@pytest.fixture(scope="module")
def tiny_tc():
    return TransCenterDetector(TINY, test_size=TEST_SIZE, out_thresh=0.0)


def _frame(rng, h=24, w=40):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.slow
def test_transcenter_detect_contract(tiny_tc, rng):
    out = tiny_tc.detect(_frame(rng))
    assert out.boxes_tlbr.shape[1] == 4 if len(out.boxes_tlbr) else True
    assert out.image.shape == (TEST_SIZE[0], TEST_SIZE[1], 3)
    assert out.scale == pytest.approx(min(32 / 24, 48 / 40))
    assert np.isfinite(out.scores).all()


@pytest.mark.slow
def test_transcenter_is_stateful(tiny_tc, rng):
    """The previous frame must influence the current detection (pre_sample,
    transcenter.py:89-97,194) and reset() must clear it."""
    f1, f2 = _frame(rng), _frame(rng)
    tiny_tc.reset()
    tiny_tc.detect(f1)
    with_state = tiny_tc.detect(f2)
    tiny_tc.reset()
    without_state = tiny_tc.detect(f2)  # pre = curr on first frame
    assert (
        with_state.scores.shape != without_state.scores.shape
        or not np.allclose(with_state.scores, without_state.scores)
    )


@pytest.mark.slow
def test_transcenter_feedback_two_frame_loop(tiny_tc, rng):
    """2-frame integration: the tracker's position export feeds the detector
    as pre_cts priors (mot_evaluator.py:158 + byte_tracker.py:658-692)."""
    from busca_tpu.eval.detector import track_frames_with_detector
    from busca_tpu.trackers import TransCenterByteTracker
    from busca_tpu.trackers.byte import ByteTrackerConfig

    tiny_tc.reset()
    tracker = TransCenterByteTracker(ByteTrackerConfig(track_thresh=0.0))
    # seed a track so frame 2 produces real feedback positions
    tracker.update(
        np.array([[5.0, 5.0, 15.0, 20.0]]), np.array([0.9]), 1.0, None
    )
    pos = tracker.get_detector_positions()
    assert pos is not None and pos.shape == (1, 4)

    calls = []
    orig = tiny_tc.detect

    def spy(frame, current_pos=None):
        calls.append(current_pos)
        return orig(frame, current_pos=current_pos)

    tiny_tc.detect = spy
    res = track_frames_with_detector(
        tiny_tc, tracker, [_frame(rng), _frame(rng)], min_box_area=0.0
    )
    tiny_tc.detect = orig
    assert res.num_frames == 2
    assert len(calls) == 2
    assert calls[0] is not None  # the seeded track was exported


@pytest.mark.slow
def test_transcenter_mot20_clip_preset(rng):
    """MOT20 preset (K=500, clip=True, transcenter.py:42-48): output boxes
    are clamped to the input plane."""
    cfg17 = TransCenterConfig.for_dataset("mot17")
    cfg20 = TransCenterConfig.for_dataset("MOT20")
    assert (cfg17.K, cfg17.clip) == (300, False)
    assert (cfg20.K, cfg20.clip) == (500, True)

    tiny_clip = TransCenterConfig.tiny(clip=True)
    det = TransCenterDetector(tiny_clip, test_size=TEST_SIZE, out_thresh=0.0)
    out = det.detect(_frame(rng))
    th, tw = TEST_SIZE
    if len(out.boxes_tlbr):
        assert (out.boxes_tlbr[:, 0] >= 0).all()
        assert (out.boxes_tlbr[:, 2] <= tw - 1 + 1e-6).all()
        assert (out.boxes_tlbr[:, 1] >= 0).all()
        assert (out.boxes_tlbr[:, 3] <= th - 1 + 1e-6).all()


@pytest.mark.slow
def test_sampling_modes_share_contract(rng):
    """Both decoder sampling modes (TPU-native local, exact deformable)
    produce the same output contract from the same inputs."""
    import jax as _jax

    h, w = 32, 48
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    hm = jnp.zeros((1, h // 4, w // 4, 1), jnp.float32)
    for mode in ("local", "deformable"):
        cfg = TransCenterConfig.tiny(sampling=mode)
        model = TransCenterDETR(cfg)
        variables = _jax.jit(model.init)(_jax.random.PRNGKey(0), x, x, hm)
        out = model.apply(variables, x, x, hm)
        assert out["hm"].shape == (1, h // 4, w // 4, 1), mode
        assert np.isfinite(np.asarray(out["wh"])).all(), mode


def test_local_pallas_tap_sum_matches_chunked(rng, monkeypatch):
    """sampling="local_pallas" (fused Pallas tap-sum, interpret mode here)
    == sampling="local" (row-chunked lax.map) from the SAME param tree."""
    import jax as _jax
    import jax.experimental.pallas as _pl

    from busca_tpu.ops import lma_pallas

    orig = _pl.pallas_call
    monkeypatch.setattr(
        lma_pallas.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    h, w = 32, 48
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    hm = jnp.zeros((1, h // 4, w // 4, 1), jnp.float32)
    m_chunk = TransCenterDETR(TransCenterConfig.tiny(sampling="local"))
    m_pallas = TransCenterDETR(TransCenterConfig.tiny(sampling="local_pallas"))
    variables = _jax.jit(m_chunk.init)(_jax.random.PRNGKey(0), x, x, hm)
    out_c = m_chunk.apply(variables, x, x, hm)
    with _jax.disable_jit():
        out_p = m_pallas.apply(variables, x, x, hm)
    for k in out_c:
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_c[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )
