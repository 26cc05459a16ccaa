"""MOT-gt training episode sampler (MOTSynth-style real-data training —
the reference trains on MOT-format gt, README.md:17)."""

import os

import numpy as np
import pytest

from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence
from busca_tpu.train.data import EpisodeSpec, MotEpisodeSampler

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def mot_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mot") / "SYN-EP-01"
    (d / "img1").mkdir(parents=True)
    (d / "gt").mkdir()
    objs = [
        SyntheticObject(
            color=np.array([60 + 60 * i, 200 - 50 * i, 80 + 40 * i],
                           np.float64),
            x0=30 + 100 * i, y0=40 + 40 * i, vx=2.0, vy=0.5, w=26, h=56,
        )
        for i in range(3)
    ]
    n = 16
    seq = SyntheticSequence(objs, num_frames=n, height=200, width=360, seed=1)
    rows = []
    for t in range(n):
        cv2.imwrite(str(d / "img1" / f"{t + 1:06d}.jpg"), seq.frame(t))
        for oid, obj in enumerate(objs):
            x, y, w, h = obj.box_at(t)
            rows.append(f"{t + 1},{oid + 1},{x:.2f},{y:.2f},{w:.2f},"
                        f"{h:.2f},1,1,1.0")
    (d / "gt" / "gt.txt").write_text("\n".join(rows) + "\n")
    (d / "seqinfo.ini").write_text(
        "[Sequence]\nname=SYN-EP-01\nimDir=img1\nframeRate=30\n"
        f"seqLength={n}\nimWidth=360\nimHeight=200\nimExt=.jpg\n"
    )
    return str(d)


def test_batch_contract(mot_dir):
    spec = EpisodeSpec(batch=6, seq_len=4, num_candidates=3, crop_hw=(48, 24))
    sampler = MotEpisodeSampler([mot_dir], spec)
    rng = np.random.RandomState(0)
    b = sampler.batch(rng)
    assert b["mem_crops"].shape == (6, 4, 48, 24, 3)
    assert b["can_crops"].shape == (6, 3, 48, 24, 3)
    assert b["mem_boxes"].shape == (6, 4, 4)
    assert ((b["labels"] >= 0) & (b["labels"] <= 3)).all()  # slots or NON
    # normalized crops: roughly zero-centered, finite
    assert np.isfinite(b["mem_crops"]).all()
    assert abs(b["mem_crops"].mean()) < 3.0
    # memory boxes follow the track motion (x increases with t)
    dx = np.diff(b["mem_boxes"][:, :, 0], axis=1)
    assert (dx >= -1e-6).all()


def test_target_slot_crop_matches_gt_identity(mot_dir):
    """When the label is a candidate slot, that slot's box must be the same
    identity's gt box at the future frame (x ahead of the last memory box)."""
    spec = EpisodeSpec(batch=8, seq_len=4, num_candidates=3, crop_hw=(48, 24))
    sampler = MotEpisodeSampler([mot_dir], spec)
    rng = np.random.RandomState(1)
    b = sampler.batch(rng)
    found = 0
    for i in range(8):
        lab = int(b["labels"][i])
        if lab >= 3:
            continue  # NON episode
        last_mem_x = b["mem_boxes"][i, -1, 0]
        target_x = b["can_boxes"][i, lab, 0]
        assert target_x >= last_mem_x - 1e-6  # vx > 0 in the fixture
        found += 1
    assert found > 0


@pytest.mark.slow
def test_trains_one_step(mot_dir):
    """The sampler's batches drive the real train step."""
    import jax

    from busca_tpu.models.busca import BuscaConfig, BuscaModel
    from busca_tpu.train.trainer import make_optimizer, make_train_step

    spec = EpisodeSpec(batch=2, seq_len=3, num_candidates=2, crop_hw=(32, 16))
    sampler = MotEpisodeSampler([mot_dir], spec)
    batch = sampler.batch(np.random.RandomState(2))
    cfg = BuscaConfig(num_layer=1, reid_num_classes=5,
                      reid_layers=(1, 1, 1, 1))
    model = BuscaModel(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["mem_crops"], batch["can_crops"],
        batch["mem_boxes"], batch["can_boxes"],
    )
    opt = make_optimizer()
    step = jax.jit(make_train_step(model, opt))
    params, opt_state, metrics = step(
        variables["params"], opt.init(variables["params"]),
        batch, jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(metrics["loss"]))
