"""Training checkpoint/resume: orbax round-trip of the full train state."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from busca_tpu.models.busca import BuscaConfig, BuscaModel
from busca_tpu.models.checkpoint import restore_checkpoint, save_checkpoint
from busca_tpu.train.data import EpisodeSpec, synthetic_batch
from busca_tpu.train.trainer import make_optimizer, make_train_step


import pytest

pytestmark = pytest.mark.slow  # heavy: training / full-size torch oracles


def test_orbax_resume_reproduces_training(tmp_path, rng):
    cfg = BuscaConfig(num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1),
                      dropout_p=0.0)
    spec = EpisodeSpec(batch=4, seq_len=3, num_candidates=2, crop_hw=(64, 32))
    model = BuscaModel(cfg)
    b0 = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, spec).items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        b0["mem_crops"], b0["can_crops"], b0["mem_boxes"], b0["can_boxes"],
    )["params"]
    opt = make_optimizer(1e-3)
    state = opt.init(params)
    step = jax.jit(make_train_step(model, opt))

    # two steps, checkpoint after the first
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    params1, state1, _ = step(params, state, b0, k1)
    save_checkpoint(str(tmp_path), {"params": params1, "opt_state": state1},
                    step=1)
    b1 = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, spec).items()}
    params2, _, m2 = step(params1, state1, b1, k2)

    # restore and redo step 2 — must match bit-for-bit path
    restored = restore_checkpoint(str(tmp_path))
    r_params = restored["params"]
    # orbax restores optax NamedTuples as nested containers; re-attach by
    # flattening onto the original treedef
    flat_ref, treedef = jax.tree_util.tree_flatten(state1)
    flat_new = jax.tree_util.tree_leaves(restored["opt_state"])
    assert len(flat_ref) == len(flat_new)
    r_state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in flat_new]
    )

    params2_r, _, m2_r = step(r_params, r_state, b1, k2)
    np.testing.assert_allclose(
        float(m2["loss"]), float(m2_r["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params2),
        jax.tree_util.tree_leaves(params2_r),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
