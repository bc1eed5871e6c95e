"""Model base utilities: registry, initialization, param counting.

Replaces the reference's ``BaseNetwork._from_config`` reflective registry
(reference: gnn/models/base_network.py:9-56) with an explicit registry and
functional (pytree) parameter handling — models are flax modules, params
live outside the module, and a single ``init_model`` builds all variable
collections (params / constants / batch_stats).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(cls: Any) -> Any:
    """Class decorator registering a network under its class name."""
    MODEL_REGISTRY[cls.__name__] = cls
    return cls


def create_model(type_name: str, **kwargs: Any) -> Any:
    if type_name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {type_name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[type_name](**kwargs)


def init_model(
    model: Any,
    rng: jax.Array,
    example_inputs: Tuple[jnp.ndarray, ...],
    train: bool = False,
    **call_kwargs: Any,
) -> Dict[str, Any]:
    """Initialize all variable collections for a network.

    Returns the full variables dict ``{"params": ..., "constants": ...,
    "batch_stats": ...}`` (collections absent if unused).
    """
    param_rng, dropout_rng, const_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": param_rng, "dropout": dropout_rng, "constants": const_rng},
        example_inputs,
        train=train,
        **call_kwargs,
    )
    return variables


def count_parameters(params: Any) -> int:
    """Total number of trainable parameters in a pytree.

    Mirror of the reference's ``_count_parameters``
    (reference: gnn/models/base_network.py:49-52).
    """
    return sum(int(jnp.size(leaf)) for leaf in jax.tree_util.tree_leaves(params))
