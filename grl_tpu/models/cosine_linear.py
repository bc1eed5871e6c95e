"""Cosine-normalized classifier heads for class-incremental learning.

Re-design of the reference CosineLinear family
(reference: gnn/models/modules/modified_linear.py:9-187). Faithful to the
reference's normalization axes — including the quirk that inputs are
L2-normalized over axis 1 (the node axis for 3D ``(B, N, F)`` activations),
exactly as ``F.normalize(input, p=2, dim=1)`` does in the reference.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int = 1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize(p=2): divide by clamped L2 norm."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _uniform_stdv(key: jax.Array, shape) -> jnp.ndarray:
    """torch reset_parameters: U(-1/sqrt(in), 1/sqrt(in)) on (out, in)."""
    stdv = 1.0 / (shape[1] ** 0.5)
    return jax.random.uniform(key, shape, minval=-stdv, maxval=stdv)


class CosineLinear(nn.Module):
    """(reference: modified_linear.py:9-43)."""

    features: int
    use_sigma: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_head: int = 1) -> jnp.ndarray:
        weight = self.param("weight", _uniform_stdv, (self.features, x.shape[-1]))
        if num_head > 1:
            head_dim = x.shape[1] // num_head
            outs = []
            for h in range(num_head):
                xi = _l2_normalize(x[:, h * head_dim:(h + 1) * head_dim], axis=1)
                wi = _l2_normalize(weight[:, h * head_dim:(h + 1) * head_dim], axis=1)
                outs.append(xi @ wi.T)
            out = sum(outs)
        else:
            out = _l2_normalize(x, axis=1) @ _l2_normalize(weight, axis=1).T
        if self.use_sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma * out
        return out


class SplitCosineLinear(nn.Module):
    """Old-classes/new-classes split head (reference: modified_linear.py:46-66)."""

    features1: int
    features2: int
    use_sigma: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_head: int = 1) -> jnp.ndarray:
        out1 = CosineLinear(self.features1, use_sigma=False, name="fc1")(x, num_head)
        out2 = CosineLinear(self.features2, use_sigma=False, name="fc2")(x, num_head)
        out = jnp.concatenate([out1, out2], axis=-1)
        if self.use_sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma * out
        return out


class CosineLinearBiFeat(nn.Module):
    """Two-slice input cosine head (reference: modified_linear.py:69-112)."""

    in_features1: int
    features: int
    use_sigma: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask_feat2: bool = False,
        mean_feat2: jnp.ndarray | None = None,
        eval_mode: bool = False,
    ) -> jnp.ndarray:
        in2 = x.shape[1] - self.in_features1
        weight1 = self.param("weight1", _uniform_stdv, (self.features, self.in_features1))
        weight2 = self.param("weight2", _uniform_stdv, (self.features, in2))
        input1 = _l2_normalize(x[:, : self.in_features1], axis=1)
        if mean_feat2 is not None:
            assert mask_feat2
            input2 = _l2_normalize(mean_feat2, axis=1)
        else:
            input2 = _l2_normalize(x[:, self.in_features1:], axis=1)
        out2 = input2 @ _l2_normalize(weight2, axis=1).T
        if mask_feat2:
            out2 = jax.lax.stop_gradient(out2)
        out = input1 @ _l2_normalize(weight1, axis=1).T
        if not eval_mode:
            out = out + out2
        if self.use_sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma * out
        return out


class SplitCosineLinearBiFeat(nn.Module):
    """(reference: modified_linear.py:115-139)."""

    in_features1: int
    features1: int
    features2: int
    use_sigma: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        out1 = CosineLinearBiFeat(self.in_features1, self.features1, use_sigma=False, name="fc1")(x, **kwargs)
        out2 = CosineLinearBiFeat(self.in_features1, self.features2, use_sigma=False, name="fc2")(x, **kwargs)
        out = jnp.concatenate([out1, out2], axis=-1)
        if self.use_sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma * out
        return out


class GroupCosineLinear(nn.Module):
    """Group-normalized cosine head (reference: modified_linear.py:142-168)."""

    features: int
    use_sigma: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", _uniform_stdv, (self.features, x.shape[-1]))
        norm_sq = jax.lax.stop_gradient(jnp.sum(weight * weight, axis=1))
        scale = jnp.sqrt(jnp.mean(norm_sq))
        out = _l2_normalize(x, axis=1) @ (weight / scale).T
        if self.use_sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma * out
        return out


class SplitGroupCosineLinear(nn.Module):
    """(reference: modified_linear.py:171-187)."""

    features1: int
    features2: int
    use_sigma: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out1 = GroupCosineLinear(self.features1, use_sigma=False, name="fc1")(x)
        out2 = GroupCosineLinear(self.features2, use_sigma=False, name="fc2")(x)
        out = jnp.concatenate([out1, out2], axis=-1)
        if self.use_sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma * out
        return out
