"""LR schedules + optimizer construction.

Parity (SURVEY.md §2.1 "LR schedule": step / multistep / cosine with
warmup epochs; SGD+momentum or AdamW per config). Schedules are in
optimizer steps; epoch-denominated config values are converted with
``steps_per_epoch``.
"""

from __future__ import annotations

import optax


def make_lr_schedule(cfg, steps_per_epoch: int):
    base = cfg.base_learning_rate
    warmup_steps = int(cfg.warmup_epoch * steps_per_epoch)
    total_steps = max(int(cfg.epochs * steps_per_epoch), warmup_steps + 1)

    if cfg.lr_scheduler == "cosine":
        main = optax.cosine_decay_schedule(
            base, decay_steps=max(total_steps - warmup_steps, 1))
    elif cfg.lr_scheduler == "step":
        main = optax.exponential_decay(
            base, transition_steps=int(cfg.lr_decay_steps * steps_per_epoch),
            decay_rate=cfg.lr_decay_rate, staircase=True)
    elif cfg.lr_scheduler == "multistep":
        bounds = {int(m * steps_per_epoch): cfg.lr_decay_rate
                  for m in cfg.lr_milestones}
        main = optax.piecewise_constant_schedule(base, bounds)
    else:
        raise ValueError(cfg.lr_scheduler)

    if warmup_steps > 0:
        warm = optax.linear_schedule(base * 0.01, base, warmup_steps)
        return optax.join_schedules([warm, main], [warmup_steps])
    return main


def _decay_mask(params):
    """Weight decay on matrices/kernels only (biases & BN scales exempt)."""
    import jax

    def is_kernel(path, p):
        return p.ndim >= 2

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def make_optimizer(cfg, steps_per_epoch: int):
    lr = make_lr_schedule(cfg, steps_per_epoch)
    parts = []
    if cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.optimizer == "sgd":
        if cfg.weight_decay > 0:
            parts.append(optax.add_decayed_weights(
                cfg.weight_decay, mask=_decay_mask))
        parts.append(optax.sgd(lr, momentum=cfg.momentum, nesterov=False))
    elif cfg.optimizer == "adamw":
        parts.append(optax.adamw(
            lr, weight_decay=cfg.weight_decay, mask=_decay_mask))
    else:
        raise ValueError(cfg.optimizer)
    return optax.chain(*parts), lr
