"""Self-supervised GCN: DropEdge trunk + task-switched SSL heads, and DGI.

Re-designs of the reference SSLGCN (reference: gnn/models/networks/
sll_gcn.py:8-144) and DGI (reference: gnn/models/networks/dgi.py:5-58).

Reference deviations, both deliberate:
  * the reference's node-classification branch calls
    ``super().get_node_emb`` which doesn't exist on GraphCNNDropEdge
    (sll_gcn.py:142 would raise AttributeError); here it runs the trunk +
    RanPAC + classifier like the parent model.
  * the reference indexes SSL edge endpoints into the flattened
    ``(B*N, d)`` embedding with per-sample-local indices (sll_gcn.py:
    84-86) — correct only for B=1; here batch offsets are applied.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from grl_tpu.models.base import register_model
from grl_tpu.models.gcn_family import GCNTrunk
from grl_tpu.models.layers import RanPAC

SSL_TASKS = (
    "node_property",
    "edge_mask",
    "pairwise_distance",
    "pairwise_similarity",
    "graph_edit_distance",
    "graph_classification",
)


def _graph_embedding(node_emb: jnp.ndarray) -> jnp.ndarray:
    """[max ; mean] pooled graph embedding (reference: sll_gcn.py:96-120)."""
    return jnp.concatenate(
        [
            jnp.max(node_emb, axis=1, keepdims=True),
            jnp.mean(node_emb, axis=1, keepdims=True),
        ],
        axis=-1,
    )


@register_model
class SSLGCN(nn.Module):
    input_dim: int
    output_dim: int
    num_edges: int
    n_pairwise_distance: int = 4
    n_graph_classes: int = 204
    net_size: int = 256
    use_attention: bool = True
    rp_factor: int = 10
    dropout_rate: float = 0.5
    edge_dropout_rate: float = 0.3

    def _trunk(self) -> GCNTrunk:
        # SSLGCN's get_node_emb does NOT apply DropEdge
        # (sll_gcn.py:53-62 passes A straight to each gcn).
        return GCNTrunk(
            net_size=self.net_size,
            num_edges=self.num_edges,
            dropout_rate=self.dropout_rate,
            edge_dropout_rate=0.0,
            g1_first=True,
            use_attention=self.use_attention,
            name="trunk",
        )

    def _node_emb(self, trunk: GCNTrunk, inputs, train: bool) -> jnp.ndarray:
        emb = trunk(inputs, train)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(emb)

    @nn.compact
    def __call__(
        self,
        inputs: Tuple[jnp.ndarray, ...],
        train: bool = False,
        task: Optional[str] = None,
        edges: Optional[jnp.ndarray] = None,
        **_: Any,
    ) -> Any:
        half = self.net_size // 2
        trunk = self._trunk()
        heads = {
            "node_property": nn.Dense(1, name="head_node_property"),
            "edge_mask": nn.Dense(1, name="head_edge_mask"),
            "pairwise_distance": nn.Dense(
                self.n_pairwise_distance, name="head_pairwise_distance"
            ),
            "pairwise_similarity": nn.Dense(1, name="head_pairwise_similarity"),
            "graph_edit_distance": nn.Dense(1, name="head_graph_edit_distance"),
            "graph_classification": nn.Dense(
                self.n_graph_classes, name="head_graph_classification"
            ),
        }

        if task == "node_property":
            return heads[task](self._node_emb(trunk, inputs, train))

        if task in ("edge_mask", "pairwise_distance", "pairwise_similarity"):
            node_emb = self._node_emb(trunk, inputs, train)
            B, N, d = node_emb.shape
            flat = node_emb.reshape(-1, d)
            # Per-sample local indices + batch offsets (reference bug fix,
            # see module docstring).
            offsets = (jnp.arange(B) * N)[:, None]
            src = flat[(edges[:, :, 0] + offsets).reshape(-1)]
            dst = flat[(edges[:, :, 1] + offsets).reshape(-1)]
            out = heads[task](jnp.abs(src - dst))
            return out.reshape(B, edges.shape[1], -1)

        if task == "graph_edit_distance":
            src_emb = _graph_embedding(self._node_emb(trunk, inputs[:2], train))
            dst_emb = _graph_embedding(self._node_emb(trunk, inputs[2:], train))
            return heads[task](jnp.abs(src_emb - dst_emb))

        if task == "graph_classification":
            node_emb = self._node_emb(trunk, inputs, train)
            return heads[task](_graph_embedding(node_emb))

        if task == "dgi":
            pos = self._node_emb(trunk, inputs[:2], train)
            neg = self._node_emb(trunk, inputs[2:], train)
            return pos, neg

        # Node classification (parent-model path).
        node_emb = self._node_emb(trunk, inputs, train)
        if self.is_initializing():
            # Touch every SSL head so one init covers all task branches.
            ge = _graph_embedding(node_emb)
            for head_name in ("node_property", "edge_mask",
                              "pairwise_distance", "pairwise_similarity"):
                heads[head_name](node_emb)
            heads["graph_edit_distance"](jnp.abs(ge - ge))
            heads["graph_classification"](ge)
        rp_size = half * self.rp_factor
        node_emb = nn.relu(RanPAC(rp_size, name="w_rand")(node_emb))
        node_emb = nn.Dropout(self.dropout_rate, deterministic=not train)(node_emb)
        return nn.Dense(self.output_dim, name="classifier")(node_emb)


class ReadOut(nn.Module):
    """Mean-pool + sigmoid graph summary (reference: dgi.py:31-38)."""

    @nn.compact
    def __call__(self, V: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(jnp.mean(V, axis=1))


class Discriminator(nn.Module):
    """Bilinear pos/neg scorer (reference: dgi.py:40-58)."""

    input_dim: int

    @nn.compact
    def __call__(self, S: jnp.ndarray, H_pos: jnp.ndarray, H_neg: jnp.ndarray):
        W = self.param(
            "bilinear",
            nn.initializers.xavier_uniform(),
            (self.input_dim, self.input_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        S = S[:, None, :]  # (B, 1, d)

        def score(H: jnp.ndarray) -> jnp.ndarray:
            return jnp.einsum("bnd,de,bme->bn", H, W, S) + bias

        return score(H_pos), score(H_neg)


@register_model
class DGI(nn.Module):
    """Deep Graph Infomax contrastive wrapper (reference: dgi.py:5-28).

    ``encoder`` is any module returning node embeddings of width
    ``output_dim`` (typically SSLGCN in 'dgi' task mode).
    """

    encoder: Any
    output_dim: int

    def setup(self):
        self.readout = ReadOut()
        self.discriminator = Discriminator(self.output_dim)

    def __call__(self, V: jnp.ndarray, A: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder((V, A), train=train)

    def forward_contrastive(
        self, H_pos: jnp.ndarray, H_neg: jnp.ndarray
    ) -> jnp.ndarray:
        S = self.readout(H_pos)
        pos, neg = self.discriminator(S, H_pos, H_neg)
        return jnp.concatenate([pos, neg], axis=1)


def init_dgi_variables(model: DGI, rng: jax.Array, V: jnp.ndarray, A: jnp.ndarray,
                       emb_dim: int) -> dict:
    """Initialize both the encoder path and the discriminator path.

    flax lazily creates only the params a call touches, so the contrastive
    head needs its own init pass; the two param trees are merged.
    """
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    rngs = {"params": k1, "dropout": k2, "constants": k3}
    enc_vars = model.init(rngs, V, A)
    H = jnp.zeros((V.shape[0], V.shape[1], emb_dim))
    disc_vars = model.init({"params": k4}, H, H, method=model.forward_contrastive)
    merged = dict(enc_vars)
    merged["params"] = {**enc_vars["params"], **disc_vars["params"]}
    return merged
