"""The dp x tp-sharded train step must compute the SAME numerics as the
single-device step — GSPMD shards the computation, it must not change it
(reduction reassociation aside).

Runs on the virtual 8-device CPU mesh from conftest."""

import numpy as np
import jax
import pytest

from busca_tpu.models.busca import BuscaConfig
from busca_tpu.parallel.mesh import make_mesh
from busca_tpu.train.data import EpisodeSpec
from busca_tpu.train.trainer import train_smoke


@pytest.mark.slow
def test_sharded_step_matches_unsharded():
    config = BuscaConfig(num_layer=2, reid_num_classes=7,
                         reid_layers=(1, 1, 1, 1))
    spec = EpisodeSpec(batch=8, seq_len=3, num_candidates=2, crop_hw=(64, 32))

    mesh = make_mesh(len(jax.devices()))
    params_sharded, metrics_sharded = train_smoke(
        steps=2, config=config, spec=spec, seed=3, mesh=mesh
    )
    params_single, metrics_single = train_smoke(
        steps=2, config=config, spec=spec, seed=3, mesh=None
    )

    assert metrics_sharded["loss"] == pytest.approx(
        metrics_single["loss"], rel=1e-4
    )
    assert metrics_sharded["accuracy"] == pytest.approx(
        metrics_single["accuracy"], abs=1e-6
    )

    flat_s = jax.tree_util.tree_leaves_with_path(params_sharded)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(params_single))
    checked = 0
    for path, leaf_s in flat_s:
        leaf_u = flat_u[path]
        # after 2 AdamW steps: elements with near-zero gradients pick up
        # update-sign noise from cross-device reduction reassociation (the
        # per-step update magnitude is lr=1e-4) — a real sharding bug (wrong
        # batch stats, missing all-reduce) shifts params by orders more
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_u),
            rtol=0, atol=6e-4,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked > 20


@pytest.mark.slow
def test_sharded_inference_matches_single_device():
    """A dp-sharded / tp-sharded associate-style forward must equal the
    single-device result (the DDP-eval role, tools/track.py:305-316) —
    the same check __graft_entry__.dryrun_multichip runs for the driver."""
    import jax.numpy as jnp

    from busca_tpu.models.busca import BuscaModel
    from busca_tpu.parallel.mesh import batch_sharding, param_shardings

    config = BuscaConfig(num_layer=2, reid_num_classes=7,
                         reid_layers=(1, 1, 1, 1))
    model = BuscaModel(config)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    t, l_mem, c, h, w = 2 * n_dev, 3, 2, 64, 32
    rng = np.random.RandomState(2)
    mem_crops = rng.randn(t, l_mem, h, w, 3).astype(np.float32)
    can_crops = rng.randn(t, c, h, w, 3).astype(np.float32)

    def boxes(n):
        xy = rng.uniform(0, 400, (t, n, 2))
        wh = rng.uniform(10, 80, (t, n, 2))
        return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)

    mem_boxes, can_boxes = boxes(l_mem), boxes(c)
    mask = np.ones((t,), np.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(3), mem_crops, can_crops, mem_boxes, can_boxes,
        mask,
    )
    params = variables["params"]

    def infer(params, mem_crops, can_crops, mem_boxes, can_boxes, mask):
        logits = model.apply(
            {"params": params}, mem_crops, can_crops, mem_boxes, can_boxes,
            mask,
        )
        return jax.nn.softmax(logits, axis=-1)

    single = np.asarray(
        jax.jit(infer)(params, mem_crops, can_crops, mem_boxes, can_boxes,
                       mask)
    )
    p_shard = param_shardings(params, mesh)
    arr_args = (mem_crops, can_crops, mem_boxes, can_boxes, mask)
    sharded = np.asarray(
        jax.jit(
            infer,
            in_shardings=(
                p_shard,
                *(batch_sharding(mesh, np.ndim(a)) for a in arr_args),
            ),
        )(jax.device_put(params, p_shard),
          *(jax.device_put(a, batch_sharding(mesh, np.ndim(a)))
            for a in arr_args))
    )
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-4)
