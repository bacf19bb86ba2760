"""Jitted train/eval steps with data-parallel GSPMD sharding.

One jitted ``train_step(state, batch, rng) -> (state, metrics)`` is the
whole training engine hot path (SURVEY.md §3.1): forward, loss, backward,
optimizer update, metric computation — a single XLA program. Under a
('data','model') mesh the batch is sharded over 'data'; jit emits the
gradient all-reduce over ICI (the reference's NCCL DDP, minus the code).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from closerlook3d_tpu.parallel.mesh import batch_sharding, replicated_sharding
from closerlook3d_tpu.train.state import TrainState


def batch_geometry(batch):
    """Precomputed geometry dict from geom_* batch keys (None if absent)."""
    geom = {k[5:]: v for k, v in batch.items() if k.startswith("geom_")}
    return geom or None


def apply_task_loss(task: str, loss_fn: Callable, logits, batch):
    if task == "classification":
        return loss_fn(logits, batch["label"])
    if task == "scene_segmentation":
        return loss_fn(logits, batch["labels"], batch["mask"])
    if task == "part_segmentation":
        return loss_fn(logits, batch["labels"], batch["category"],
                       batch["mask"])
    raise ValueError(task)


def task_metrics(task: str, logits, batch, num_parts=None):
    if task == "classification":
        pred = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((pred == batch["label"]).astype(jnp.float32))
        return {"acc": acc}
    if task == "part_segmentation" and num_parts:
        # union-logit columns outside the sample's category slice get no
        # gradient from the multi-shape loss — mask them before argmax
        # (see losses.category_slice_mask)
        from closerlook3d_tpu.models.losses import category_slice_mask
        sl = category_slice_mask(batch["category"], tuple(num_parts))
        logits = jnp.where(sl[:, None, :], logits, -jnp.inf)
    pred = jnp.argmax(logits, axis=-1)
    m = batch["mask"].astype(jnp.float32)
    correct = (pred == batch["labels"]).astype(jnp.float32) * m
    return {"acc": jnp.sum(correct) / jnp.maximum(jnp.sum(m), 1.0)}


def make_train_step(model, loss_fn, task: str, mesh=None, donate=True,
                    num_parts=None):
    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["xyz"], batch["mask"], batch["features"],
                train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"], geometry=batch_geometry(batch))
            loss = apply_task_loss(task, loss_fn, out, batch)
            return loss, (out, mutated)

        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        (loss, (logits, mutated)), grads = grad_fn(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"])
        metrics = {"loss": loss,
                   **task_metrics(task, logits, batch, num_parts)}
        return state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    bs = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, loss_fn, task: str, mesh=None, num_parts=None):
    def eval_step(state: TrainState, batch):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["xyz"], batch["mask"], batch["features"], train=False,
            geometry=batch_geometry(batch))
        loss = apply_task_loss(task, loss_fn, logits, batch)
        return logits, {"loss": loss,
                        **task_metrics(task, logits, batch, num_parts)}

    if mesh is None:
        return jax.jit(eval_step)
    bs = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(rep, bs),
                   out_shardings=(bs, rep))
