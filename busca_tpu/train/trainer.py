"""Training loop: multi-choice cross-entropy over candidates, mesh-sharded.

The reference ships no training code (weights were trained offline on
MOTSynth); this is the framework's native trainer.  The objective is the
paper's multi-choice QA: softmax cross-entropy of the decision logits against
the correct candidate slot (or NON/BAD).

Distribution (see :mod:`busca_tpu.parallel.mesh`): the batch shards over the
``dp`` mesh axis, the Transformer's projections shard over ``tp``; under
GSPMD, jitting the step with these shardings makes XLA insert the gradient
all-reduce over ICI — no hand-written collectives.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from busca_tpu.models.busca import BuscaConfig, BuscaModel
from busca_tpu.parallel import mesh as meshlib


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    grad_clip: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """AdamW, optionally with linear warmup + cosine decay and global-norm
    gradient clipping (the standard large-batch TPU training recipe)."""
    if total_steps is not None:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
        )
    else:
        schedule = learning_rate
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def loss_fn(model: BuscaModel, params, batch, rng) -> jnp.ndarray:
    logits = model.apply(
        {"params": params},
        batch["mem_crops"],
        batch["can_crops"],
        batch["mem_boxes"],
        batch["can_boxes"],
        batch.get("mask"),
        deterministic=False,
        rngs={"dropout": rng},
    )
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["labels"]
    )
    if batch.get("mask") is not None:
        m = batch["mask"]
        return (losses * m).sum() / jnp.maximum(m.sum(), 1.0)
    return losses.mean()


def make_train_step(model: BuscaModel, optimizer: optax.GradientTransformation):
    """Returns ``step(params, opt_state, batch, rng) -> (params, opt_state,
    metrics)`` — pure, jittable, shardable."""

    def step(params, opt_state, batch, rng):
        def lf(p):
            logits = model.apply(
                {"params": p},
                batch["mem_crops"],
                batch["can_crops"],
                batch["mem_boxes"],
                batch["can_boxes"],
                batch.get("mask"),
                deterministic=False,
                rngs={"dropout": rng},
            )
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["labels"]
            )
            acc = (logits.argmax(-1) == batch["labels"]).astype(jnp.float32)
            mask = batch.get("mask")
            if mask is None:
                return losses.mean(), acc.mean()
            # padded lanes are excluded from ReID BN stats via the same mask;
            # exclude them from the gradient and the accuracy too
            denom = jnp.maximum(mask.sum(), 1.0)
            return (losses * mask).sum() / denom, (acc * mask).sum() / denom

        (loss, acc), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_sharded_train_step(
    model: BuscaModel,
    optimizer: optax.GradientTransformation,
    mesh,
    params,
):
    """Jit the train step over a mesh with dp-sharded batches and tp-sharded
    Transformer weights.

    Params are placed according to the Megatron-style rules first and the
    optimizer state is initialized *from the sharded params*, so its moments
    inherit the same shardings without explicit spec plumbing.  Returns
    (step_fn, sharded_params, sharded_opt_state).
    """
    p_shard = meshlib.param_shardings(params, mesh)
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    step = make_train_step(model, optimizer)
    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, batch, rng):
        batch = {
            k: jax.device_put(v, meshlib.batch_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        return jitted(params, opt_state, batch, rng)

    return run, params, opt_state


def train_smoke(
    steps: int = 3,
    batch: int = 8,
    config: Optional[BuscaConfig] = None,
    spec=None,
    seed: int = 0,
    mesh=None,
):
    """Tiny smoke-training run (used by tests and the multichip dry-run)."""
    import numpy as np

    from busca_tpu.train.data import EpisodeSpec, synthetic_batch

    config = config or BuscaConfig(
        num_layer=2, reid_num_classes=7, reid_layers=(1, 1, 1, 1)
    )
    spec = spec or EpisodeSpec(batch=batch, seq_len=3, num_candidates=2,
                               crop_hw=(64, 32))
    model = BuscaModel(config)
    rng_np = np.random.RandomState(seed)
    b0 = synthetic_batch(rng_np, spec)
    key = jax.random.PRNGKey(seed)
    variables = jax.jit(model.init)(
        key,
        jnp.asarray(b0["mem_crops"]),
        jnp.asarray(b0["can_crops"]),
        jnp.asarray(b0["mem_boxes"]),
        jnp.asarray(b0["can_boxes"]),
    )
    params = variables["params"]
    optimizer = make_optimizer()

    if mesh is not None:
        step, params, opt_state = make_sharded_train_step(
            model, optimizer, mesh, params
        )
    else:
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(model, optimizer))

    metrics = None
    for i in range(steps):
        b = synthetic_batch(rng_np, spec)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, b, sub)
    return params, jax.tree_util.tree_map(float, metrics)
