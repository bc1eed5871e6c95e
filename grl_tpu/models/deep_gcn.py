"""Deep GCN stacks with BatchNorm blocks and interleaved RanPAC.

Re-designs of DeepRPGCN (reference: gnn/models/networks/deep_rp_gcn.py:
71-150 — a 29-layer GCN stack with skip-concat every 3 layers) and
DeepRPRobustGCN (reference: gnn/models/networks/deep_rp_robust_gcn.py:
66-168 — 9 explicit GCN blocks + RanPAC + self-attention).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from grl_tpu.models.base import register_model
from grl_tpu.models.layers import (
    EdgeDropout,
    EmbeddingBlock,
    GCNBlock,
    NodeSelfAtten,
    RanPAC,
)

Inputs = Tuple[jnp.ndarray, Any]

# Reference constants (deep_rp_gcn.py:11-14).
NUM_GCN_LAYERS = 29
RP_LAYER_RELATIVE_POSITION: Optional[int] = None
SKIP_CONNECTION_POS = 3


@register_model
class DeepRPGCN(nn.Module):
    """29-layer GCN stack, skip-concat every 3 layers
    (reference: deep_rp_gcn.py:71-150)."""

    input_dim: int
    output_dim: int
    num_edges: int
    net_size: int = 256
    rp_size: Optional[int] = 10000
    lambda_value: float = 0.01
    num_layers: int = NUM_GCN_LAYERS
    skip_connection_pos: Optional[int] = SKIP_CONNECTION_POS
    rp_relative_position: Optional[int] = RP_LAYER_RELATIVE_POSITION
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False, **_: Any) -> jnp.ndarray:
        V, A = inputs
        feats = EmbeddingBlock(self.net_size, name="emb1")(V, train)

        # Sequential stack mirroring CustomGCNSequential.forward
        # (reference: deep_rp_gcn.py:71-103): the skip buffer refreshes and
        # a [prev, cur] concat feeds each skip-position layer.
        prev_feats = feats
        skip = self.skip_connection_pos
        for idx in range(self.num_layers):
            if skip and idx % skip == 0:
                prev_feats = feats
                feats = jnp.concatenate([prev_feats, feats], axis=-1)
                block = GCNBlock(self.net_size, self.num_edges, name=f"gcn{idx}")
            else:
                block = GCNBlock(self.net_size, self.num_edges, name=f"gcn{idx}")
            feats = block(feats, A, train)
            if self.rp_relative_position and idx % self.rp_relative_position == 0:
                rp = RanPAC(
                    self.net_size,
                    init_scale=(self.net_size ** 0.5) * self.lambda_value,
                    name=f"rp{idx}",
                )
                feats = nn.leaky_relu(rp(feats), negative_slope=0.2)

        feats = EmbeddingBlock(self.net_size, name="emb2")(feats, train)
        feats = nn.Dropout(self.dropout_rate, deterministic=not train)(feats)
        return nn.Dense(self.output_dim, name="classifier")(feats)


@register_model
class DeepRPRobustGCN(nn.Module):
    """9 explicit GCN blocks with skip-concats + RanPAC(init λ=1) +
    self-attention (reference: deep_rp_robust_gcn.py:66-168).

    ``lambda_value`` is schedulable at call time — the trainer's cosine
    lambda schedule feeds it per step (reference:
    gnn/trainer/training_procedures/kv_procedure.py:201-204 writes
    ``model.lambda_value``; here it is a pure call argument).
    """

    input_dim: int
    output_dim: int
    num_edges: int
    net_size: int = 256
    use_attention: bool = True
    rp_size: Optional[int] = 10000
    lambda_value: float = 0.01
    dropout_rate: float = 0.3
    edge_dropout_rate: float = 0.2

    @nn.compact
    def __call__(
        self,
        inputs: Inputs,
        train: bool = False,
        lambda_value: Optional[float] = None,
        **_: Any,
    ) -> jnp.ndarray:
        V, A = inputs
        det = not train
        lam = self.lambda_value if lambda_value is None else lambda_value
        dropout = nn.Dropout(self.dropout_rate, deterministic=det)
        edge_dropout = EdgeDropout(self.edge_dropout_rate, name="edge_dropout")

        def block(name: str, feats: jnp.ndarray, drop_edges: bool) -> jnp.ndarray:
            gcn = GCNBlock(self.net_size, self.num_edges, name=name)
            if drop_edges:
                A_used, self_scale = edge_dropout(A, det)
                return gcn(feats, A_used, train, self_scale)
            return gcn(feats, A, train)

        embedding = EmbeddingBlock(self.net_size, name="emb1")(V, train)
        g1 = block("gcn1", embedding, False)
        g2 = block("gcn2", g1, False)
        g3 = dropout(block("gcn3", jnp.concatenate([g1, g2], axis=-1), True))
        g4 = block("gcn4", g3, False)
        g5 = block("gcn5", g4, False)
        g6 = dropout(block("gcn6", jnp.concatenate([g4, g5], axis=-1), True))
        g7 = block("gcn7", g6, False)
        g8 = block("gcn8", g7, True)
        g9 = dropout(block("gcn9", g8, True))

        feats = EmbeddingBlock(self.net_size, name="emb2")(
            jnp.concatenate([g8, g9], axis=-1), train
        )
        rp = RanPAC(self.net_size, init_scale=(self.net_size ** 0.5) * 1.0, name="rp_embed2")
        feats = nn.leaky_relu(rp(feats, scale=lam), negative_slope=0.2)
        if self.use_attention:
            feats = NodeSelfAtten(self.net_size, name="self_atten")(feats)
        feats = dropout(feats)
        return nn.Dense(self.output_dim, name="classifier")(feats)
