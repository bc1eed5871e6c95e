"""Optimizers: optax-backed, torch-name-compatible registry.

Replaces the reference's reflective ``getattr(torch.optim, name)`` wrapper
(reference: gnn/trainer/optimizers/builtin_optimizer.py:10-27). The
learning rate is injected as a mutable hyperparameter so the manual
per-epoch LR scheduling of the reference (base_procedure.py:172-185)
maps to one assignment into opt_state.
"""
from __future__ import annotations

from typing import Any, Dict

import optax

# torch.optim name -> optax constructor + kwarg mapping.
_TORCH_TO_OPTAX = {
    "Adam": lambda lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_: (
        optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    ),
    "AdamW": lambda lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01, **_: optax.adamw(
        lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    ),
    "SGD": lambda lr, momentum=0.0, weight_decay=0.0, nesterov=False, **_: optax.sgd(
        lr, momentum=momentum or None, nesterov=nesterov
    ),
    "RMSprop": lambda lr, alpha=0.99, eps=1e-8, momentum=0.0, **_: optax.rmsprop(
        lr, decay=alpha, eps=eps, momentum=momentum or None
    ),
    "Adagrad": lambda lr, eps=1e-10, **_: optax.adagrad(lr, eps=eps),
    "Adadelta": lambda lr, rho=0.9, eps=1e-6, **_: optax.adadelta(lr, rho=rho, eps=eps),
    "Lamb": lambda lr, **kw: optax.lamb(lr, **kw),
    "Lion": lambda lr, **kw: optax.lion(lr, **kw),
}


class BaseOptimizer:
    @classmethod
    def _from_config(cls, config: Dict[str, Any]) -> "BaseOptimizer":
        return cls(**dict(config or {}))

    def make(self, max_grad_norm: float | None = None) -> optax.GradientTransformation:
        raise NotImplementedError


class BuiltinOptimizer(BaseOptimizer):
    """``type_optimizer`` + kwargs, like the reference's BuitlinOptimizer [sic]."""

    def __init__(self, type_optimizer: str = "Adam", lr: float = 1e-3, **kwargs: Any):
        if type_optimizer not in _TORCH_TO_OPTAX:
            raise KeyError(
                f"Unknown optimizer {type_optimizer!r}; "
                f"available: {sorted(_TORCH_TO_OPTAX)}"
            )
        self.type_optimizer = type_optimizer
        self.learning_rate = lr
        self.kwargs = kwargs

    def make(self, max_grad_norm: float | None = None) -> optax.GradientTransformation:
        """Build the transformation; LR is a mutable injected hyperparam."""

        def factory(learning_rate: float) -> optax.GradientTransformation:
            tx = _TORCH_TO_OPTAX[self.type_optimizer](learning_rate, **self.kwargs)
            if max_grad_norm:
                tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
            return tx

        return optax.inject_hyperparams(factory)(learning_rate=self.learning_rate)


# Reference-compatible alias (the reference class name carries a typo —
# gnn/trainer/optimizers/builtin_optimizer.py:10).
BuitlinOptimizer = BuiltinOptimizer


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Write the injected learning-rate hyperparameter (functional)."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyperparams)
