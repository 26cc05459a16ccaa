"""Trainer + multichip sharding tests (8-device virtual CPU mesh)."""

import numpy as np
import jax

from busca_tpu.models.busca import BuscaConfig
from busca_tpu.parallel.mesh import make_mesh, param_shardings
from busca_tpu.train.data import EpisodeSpec, synthetic_batch
from busca_tpu.train.trainer import train_smoke


import pytest

pytestmark = pytest.mark.slow  # heavy: training / full-size torch oracles


def test_synthetic_batch_layout(rng):
    spec = EpisodeSpec(batch=6, seq_len=3, num_candidates=2, crop_hw=(32, 16))
    b = synthetic_batch(rng, spec)
    assert b["mem_crops"].shape == (6, 3, 32, 16, 3)
    assert b["can_crops"].shape == (6, 2, 32, 16, 3)
    assert b["labels"].max() <= spec.num_choices - 1
    assert np.isfinite(b["mem_crops"]).all()


def test_mem_stride_augmentation_default_is_legacy(rng):
    """mem_stride_max=1 (the default) must generate bit-identical episodes
    to the pre-augmentation sampler — every pinned demo-model measurement
    (frozen_delta / memcap_delta tables in PARITY.md) trains with the
    default, so the default must never drift.  The >1 arm must actually
    widen the memory spacing (the broader-memory sweep's in-distribution
    guarantee)."""
    kw = dict(batch=8, seq_len=3, num_candidates=2, crop_hw=(16, 8))
    b_default = synthetic_batch(np.random.RandomState(5), EpisodeSpec(**kw))
    b_explicit = synthetic_batch(
        np.random.RandomState(5), EpisodeSpec(mem_stride_max=1, **kw)
    )
    for k in b_default:
        assert np.array_equal(b_default[k], b_explicit[k]), k

    b_wide = synthetic_batch(
        np.random.RandomState(5), EpisodeSpec(mem_stride_max=4, **kw)
    )
    d1 = np.abs(np.diff(b_default["mem_boxes"][..., 0], axis=1)).mean()
    d4 = np.abs(np.diff(b_wide["mem_boxes"][..., 0], axis=1)).mean()
    assert d4 > d1


def test_single_device_smoke_train():
    _, metrics = train_smoke(
        steps=2,
        config=BuscaConfig(
            num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1)
        ),
        spec=EpisodeSpec(batch=4, seq_len=3, num_candidates=2, crop_hw=(64, 32)),
    )
    assert np.isfinite(metrics["loss"])


def test_mesh_and_param_shardings():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 4, "tp": 2}

    import jax.numpy as jnp

    params = {
        "transformer_encoder": {
            "layers_0": {
                "self_attn": {
                    "in_proj_weight": jnp.zeros((96, 32)),
                    "out_proj": {"weight": jnp.zeros((32, 32))},
                },
                "linear1": {"weight": jnp.zeros((64, 32)), "bias": jnp.zeros(64)},
                "linear2": {"weight": jnp.zeros((32, 64))},
            }
        },
        "encoder": {"weight": jnp.zeros((32, 32))},
    }
    s = param_shardings(params, mesh)
    l0 = s["transformer_encoder"]["layers_0"]
    assert l0["self_attn"]["in_proj_weight"].spec == jax.sharding.PartitionSpec("tp", None)
    assert l0["linear1"]["weight"].spec == jax.sharding.PartitionSpec("tp", None)
    assert l0["linear1"]["bias"].spec == jax.sharding.PartitionSpec("tp")
    assert l0["linear2"]["weight"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert l0["self_attn"]["out_proj"]["weight"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert s["encoder"]["weight"].spec == jax.sharding.PartitionSpec(None, None)


def test_multichip_dryrun_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_step_matches_unsharded_numerics():
    """The dp x tp GSPMD train step must produce the same loss/metrics as the
    single-device step — sharding is a layout choice, not a semantic one
    (VERDICT r1: tp sharding was asserted, never measured)."""
    config = BuscaConfig(num_layer=2, reid_num_classes=7,
                         reid_layers=(1, 1, 1, 1))
    spec = EpisodeSpec(batch=8, seq_len=3, num_candidates=2, crop_hw=(64, 32))
    _, m_single = train_smoke(steps=1, config=config, spec=spec, mesh=None)
    mesh = make_mesh(8, tp_size=2)
    _, m_sharded = train_smoke(steps=1, config=config, spec=spec, mesh=mesh)
    # same params + same batch: only cross-shard reduction order may differ
    # (GSPMD preserves semantics); multi-step comparisons diverge because
    # adam amplifies that noise, so the check is on the first step
    np.testing.assert_allclose(m_sharded["loss"], m_single["loss"],
                               rtol=2e-4)
    np.testing.assert_allclose(m_sharded["accuracy"], m_single["accuracy"],
                               atol=1e-6)


def test_optimizer_schedule_and_clipping():
    """Warmup-cosine + grad clipping compose and step without breaking the
    smoke trainer contract."""
    import optax

    from busca_tpu.train.trainer import make_optimizer

    tx = make_optimizer(1e-3, warmup_steps=2, total_steps=10, grad_clip=0.5)
    params = {"w": np.ones((3,), np.float32)}
    state = tx.init(params)
    big_grads = {"w": np.full((3,), 100.0, np.float32)}
    updates, state = tx.update(big_grads, state, params)
    # clipped to global norm 0.5, warmup step 0 -> lr 0: update ~ 0
    assert np.all(np.abs(np.asarray(updates["w"])) < 1e-6)
    updates, state = tx.update(big_grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
