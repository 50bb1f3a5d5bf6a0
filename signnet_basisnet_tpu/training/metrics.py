"""Metrics: masked MAE/MSE/r2 and classification scores.

Graph-level metrics are weighted by graph_mask so padding graphs never count
(reference metric lib: GraphPrediction/train/metrics.py:10-68; masked node
MSE/r2: LearningFilters/training.py:140-150).
"""
from __future__ import annotations

import jax.numpy as jnp


def masked_l1(pred, target, mask):
    """Mean absolute error over valid entries (torch L1Loss semantics)."""
    err = jnp.abs(pred - target)
    while mask.ndim < err.ndim:
        mask = mask[..., None]
    denom = jnp.maximum((mask * jnp.ones_like(err)).sum(), 1.0)
    return (err * mask).sum() / denom


def masked_mse_sum(pred, target, mask):
    """Sum of squared masked errors — the LearningFilters loss
    (reference: training.py:141)."""
    err = (pred - target)
    while mask.ndim < err.ndim:
        mask = mask[..., None]
    return ((mask * err) ** 2).sum()


def masked_r2(pred, target, mask):
    while mask.ndim < target.ndim:
        mask = mask[..., None]
    w = mask * jnp.ones_like(target)
    denom = jnp.maximum(w.sum(), 1.0)
    mean = (target * w).sum() / denom
    ss_res = (((pred - target) * w) ** 2).sum()
    ss_tot = jnp.maximum((((target - mean) * w) ** 2).sum(), 1e-12)
    return 1.0 - ss_res / ss_tot


def accuracy(logits, labels, mask):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask
    return correct.sum() / jnp.maximum(mask.sum(), 1.0)


def binary_f1(pred, target, mask, threshold=0.5):
    p = (pred > threshold).astype(jnp.float32) * mask
    t = (target > threshold).astype(jnp.float32) * mask
    tp = (p * t).sum()
    prec = tp / jnp.maximum(p.sum(), 1.0)
    rec = tp / jnp.maximum(t.sum(), 1.0)
    return 2 * prec * rec / jnp.maximum(prec + rec, 1e-12)
masked_mae = masked_l1


def masked_l1_per_target(pred, target, mask):
    """Per-target MAE over real graphs: [T] vector (reference:
    Alchemy/main_alchemy.py:114-126 — per-target abs-error column sums /
    dataset size; logMAE is the mean of the per-target logs)."""
    import jax.numpy as jnp
    err = jnp.abs(pred - target) * mask[:, None]
    return err.sum(0) / jnp.maximum(mask.sum(), 1.0)


def accuracy_sbm(logits, labels, mask, num_classes: int):
    """Class-balanced accuracy: mean over classes of per-class recall, x100
    (reference: GraphPrediction/train/metrics.py:34-51 accuracy_SBM)."""
    pred = jnp.argmax(logits, axis=-1)
    accs = []
    for c in range(num_classes):
        in_c = (labels == c).astype(jnp.float32) * mask
        correct = ((pred == c).astype(jnp.float32) * in_c).sum()
        accs.append(jnp.where(in_c.sum() > 0, correct / jnp.maximum(
            in_c.sum(), 1.0), 0.0))
    return 100.0 * jnp.stack(accs).sum() / num_classes


def weighted_f1(logits, labels, mask, num_classes: int):
    """Support-weighted multi-class F1 (reference: metrics.py:64-68
    accuracy_VOC, sklearn f1_score(average='weighted'))."""
    pred = jnp.argmax(logits, axis=-1)
    total = jnp.maximum(mask.sum(), 1.0)
    f1_sum = 0.0
    for c in range(num_classes):
        p = (pred == c).astype(jnp.float32) * mask
        t = (labels == c).astype(jnp.float32) * mask
        tp = (p * t).sum()
        prec = tp / jnp.maximum(p.sum(), 1e-12)
        rec = tp / jnp.maximum(t.sum(), 1e-12)
        f1 = 2 * prec * rec / jnp.maximum(prec + rec, 1e-12)
        f1_sum = f1_sum + f1 * t.sum()
    return f1_sum / total
