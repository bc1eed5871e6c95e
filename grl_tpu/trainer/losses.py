"""Loss functions with ignore-index masking.

jnp re-designs of the reference losses (reference: gnn/trainer/losses/
cross_entropy_loss.py:10-35, binary_cross_entropy_loss.py:9-38,
focal_loss.py:10-37, mse_loss.py:7-28). All are pure functions wrapped by
config-instantiable classes; masking semantics follow torch:
``ignore_index=-100`` for CE/focal, ``target != -100`` masks for BCE/MSE,
and class-weighted CE divides by the summed weights of kept targets.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Mean CE over non-ignored targets (torch CrossEntropyLoss semantics).

    logits ``(..., C)``, integer targets ``(...)``.
    """
    mask = (targets != ignore_index).astype(logits.dtype)
    safe_targets = jnp.where(targets == ignore_index, 0, targets)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_targets[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = weight[safe_targets] * mask
    else:
        w = mask
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def binary_cross_entropy_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-100-masked mean BCE-with-logits (reference: binary_cross_entropy_loss.py:33-38)."""
    logits = logits.reshape(targets.shape)
    mask = (targets != IGNORE_INDEX).astype(logits.dtype)
    safe = jnp.where(mask > 0, targets, 0.0)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is not None:
        per = -(pos_weight * safe * log_p + (1.0 - safe) * log_not_p)
    else:
        per = -(safe * log_p + (1.0 - safe) * log_not_p)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    weight: Optional[jnp.ndarray] = None,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Multi-class focal loss (reference: focal_loss.py:23-37): NLL of
    ``(1 - p)^gamma * log p``."""
    mask = (targets != ignore_index).astype(logits.dtype)
    safe_targets = jnp.where(targets == ignore_index, 0, targets)
    logpt = jax.nn.log_softmax(logits, axis=-1)
    pt = jnp.exp(logpt)
    focal = (1.0 - pt) ** gamma * logpt
    nll = -jnp.take_along_axis(focal, safe_targets[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = weight[safe_targets] * mask
    else:
        w = mask
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_mse(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """-100-masked MSE (reference: mse_loss.py:21-28)."""
    logits = logits.reshape(targets.shape)
    mask = (targets != IGNORE_INDEX).astype(logits.dtype)
    return jnp.sum(((logits - targets) * mask) ** 2) / jnp.maximum(jnp.sum(mask), 1.0)


class BaseLoss:
    @classmethod
    def _from_config(cls, config: Dict[str, Any]) -> "BaseLoss":
        return cls(**dict(config or {}))

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


class CrossEntropyLoss(BaseLoss):
    def __init__(self, weight: Optional[List[float]] = None):
        self.weight = None if weight is None else jnp.asarray(weight, jnp.float32)

    def __call__(self, logits, targets):
        return cross_entropy(logits, targets, self.weight)


class BinaryCrossEntropyLoss(BaseLoss):
    def __init__(self, pos_weight: Optional[List[float]] = None):
        self.pos_weight = (
            None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)
        )

    def __call__(self, logits, targets):
        return binary_cross_entropy_with_logits(logits, targets, self.pos_weight)


class FocalLoss(BaseLoss):
    def __init__(self, gamma: float = 2.0, weight: Optional[List[float]] = None):
        self.gamma = gamma
        self.weight = None if weight is None else jnp.asarray(weight, jnp.float32)

    def __call__(self, logits, targets):
        return focal_loss(logits, targets, self.gamma, self.weight)


class MSELoss(BaseLoss):
    def __init__(self):
        pass

    def __call__(self, logits, targets):
        return masked_mse(logits, targets)
