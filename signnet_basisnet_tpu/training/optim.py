"""Optimizers and LR schedules.

Adam + reduce-LR-on-plateau, matching the reference's
`torch.optim.Adam` + `ReduceLROnPlateau(factor, patience, min_lr)` loop
(reference: GraphPrediction/main_ZINC_graph_regression.py:153-157,221;
Alchemy/main_alchemy.py:89-96).  The plateau state is host-side (it reacts to
the epoch's validation loss); the LR itself is fed into the jitted step as a
scalar so changing it never triggers recompilation.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import optax


def adam(weight_decay: float = 0.0):
    """Adam with torch-default hyperparameters; LR is injected per step."""
    if weight_decay:
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(1.0, flip_sign=True),
        )
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(1.0, flip_sign=True),
    )


def scale_updates(updates, lr):
    """Apply the runtime LR scalar to optimizer updates."""
    import jax
    return jax.tree.map(lambda u: u * lr, updates)


@dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics, mode='min')."""
    factor: float = 0.5
    patience: int = 25
    min_lr: float = 1e-6
    lr: float = 1e-3
    best: float = float("inf")
    bad_epochs: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr

    @property
    def converged(self) -> bool:
        """The reference's stop condition: lr fell to/below min_lr
        (main_ZINC_graph_regression.py:219-221)."""
        return self.lr <= self.min_lr * (1 + 1e-9)


@dataclass
class StepLR:
    """StepLR(step_size, gamma) — the GINESignNetPyG scheduler."""
    step_size: int = 300
    gamma: float = 0.5
    lr: float = 1e-3
    epoch: int = 0

    def step(self, metric: float = 0.0) -> float:
        self.epoch += 1
        if self.epoch % self.step_size == 0:
            self.lr *= self.gamma
        return self.lr

    @property
    def converged(self) -> bool:
        return False
