"""Dynamic-graph CNN on KNN feature graphs.

Re-design of the reference DGCNN (reference: gnn/models/networks/
dgcnn.py:11-149): per block, a KNN graph is rebuilt in feature space,
edge features ``[x_j - x_i, x_i]`` pass a 1x1 conv (a Dense over the
channel axis on TPU) + BatchNorm + LeakyReLU, then max-pool over
neighbors. The torch gather/topk scatter ops become one
``jnp.take_along_axis`` — XLA lowers it to a TPU gather.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from grl_tpu.models.base import register_model


def knn_indices(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest neighbors in feature space.

    x ``(B, V, F)``; returns ``(B, V, k)``
    (reference: dgcnn.py:11-24 — computed via -||x_i - x_j||^2 topk).
    """
    inner = -2.0 * jnp.einsum("bvf,bwf->bvw", x, x)
    sq = jnp.sum(x * x, axis=-1)
    neg_dist = -sq[:, :, None] - inner - sq[:, None, :]
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx


def knn_edge_features(x: jnp.ndarray, k: int, idx: jnp.ndarray = None) -> jnp.ndarray:
    """Edge features ``[x_j - x_i, x_i]`` -> ``(B, V, k, 2F)``
    (reference: dgcnn.py:27-64, eq. 7 of arXiv:1801.07829)."""
    B, V, F = x.shape
    k = min(k, V)
    if idx is None:
        idx = knn_indices(x, k)
    neighbors = jax.vmap(lambda xb, ib: xb[ib])(x, idx)  # (B, V, k, F)
    center = jnp.broadcast_to(x[:, :, None, :], (B, V, k, F))
    return jnp.concatenate([neighbors - center, center], axis=-1)


class _ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.leaky_relu(x, negative_slope=0.2)


@register_model
class DGCNN(nn.Module):
    """(reference: dgcnn.py:67-149). in_channels/out_channels/kk ctor parity."""

    in_channels: int
    out_channels: int
    kk: int = 20

    @nn.compact
    def __call__(
        self, inputs: Tuple[jnp.ndarray, Any], train: bool = False, **_: Any
    ) -> jnp.ndarray:
        x, _ = inputs  # adjacency unused: the graph is dynamic KNN
        feats = []
        for i, width in enumerate((64, 64, 128, 256)):
            edge = knn_edge_features(x, self.kk)
            h = _ConvBlock(width, name=f"conv{i + 1}")(edge, train)
            x = jnp.max(h, axis=2)  # max over neighbors
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)  # (B, V, 512)
        return _ConvBlock(self.out_channels, name="conv5")(x, train)

    @property
    def output_dim(self) -> int:
        return self.out_channels
