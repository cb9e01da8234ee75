"""Optimizer / scheduler builders.

Reference contract (src/refinement_models/optimizers/optimizers.py:4-49 +
train_multiview_matcher.py:26-38): Adam/AdamW with the backbone parameter
group at a reduced learning rate (ratio 0.5 keyed on the module path),
MultiStep / Cosine / Exponential schedules, and the canonical-batch linear LR
scaling (true_lr = canonical_lr * true_batch / canonical_bs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adamw"           # "adam" | "adamw"
    canonical_lr: float = 2e-4
    canonical_bs: int = 4
    true_batch_size: int = 4
    weight_decay: float = 0.0
    backbone_lr_ratio: float = 0.5
    backbone_path: str = "backbone"    # param-path prefix at reduced LR
    scheduler: str = "multistep"       # "multistep" | "cosine" | "exponential"
    milestones: Sequence[int] = (4, 8, 12, 16, 20)  # epochs (MultiStepLR)
    gamma: float = 0.5
    total_steps: int = 100_000         # cosine horizon
    warmup_steps: int = 0
    grad_clip: float = 0.5
    steps_per_epoch: int = 1000

    @property
    def lr(self) -> float:
        return self.canonical_lr * self.true_batch_size / self.canonical_bs


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.scheduler == "multistep":
        boundaries = {
            int(m * cfg.steps_per_epoch): cfg.gamma for m in cfg.milestones
        }
        sched = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    elif cfg.scheduler == "cosine":
        sched = optax.cosine_decay_schedule(cfg.lr, cfg.total_steps)
    elif cfg.scheduler == "exponential":
        sched = optax.exponential_decay(
            cfg.lr, cfg.steps_per_epoch, cfg.gamma
        )
    else:
        raise ValueError(cfg.scheduler)
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        sched = optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


def build_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    sched = build_schedule(cfg)

    def base(lr_scale: float):
        scale = optax.scale_by_schedule(lambda s: -sched(s) * lr_scale)
        if cfg.optimizer == "adamw":
            return optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(cfg.weight_decay),
                scale,
            )
        return optax.chain(optax.scale_by_adam(), scale)

    def label_fn(tree):
        import jax

        def label(path, _leaf):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            return (
                "backbone" if any(cfg.backbone_path in str(k) for k in keys)
                else "main"
            )

        return jax.tree_util.tree_map_with_path(label, tree)

    tx = optax.multi_transform(
        {"main": base(1.0), "backbone": base(cfg.backbone_lr_ratio)},
        label_fn,
    )
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
