"""GAT family: per-relation masked attention layers (V1 + GATv2),
dense-connectivity stacks, DiffPool and the GATV2 network.

Re-designs of the reference (reference: gnn/models/networks/gatv2.py:
56-298,311-428 and the HGAT layer robust_gcn.py:103-170). The per-relation
Python loop is kept (L+1 is small and each iteration is MXU-dense); the
``N x N`` score tensors are exactly the reference's dense formulation —
the sparse path for big graphs uses segment_softmax instead
(:mod:`grl_tpu.ops.segment`).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from grl_tpu.models.base import register_model


def _xavier_uniform(key, shape, dtype=jnp.float32):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


class Norm(nn.Module):
    """LayerNorm (default) or BatchNorm, then LeakyReLU
    (reference: gatv2.py:16-33)."""

    bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm"
            )(x)
        else:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class GraphAttentionLayer(nn.Module):
    """GAT V1 per-relation attention (reference: gatv2.py:56-134).

    For each relation l (plus an identity relation): score
    ``e = leaky_relu([h_i || h_j] a_l)`` masked by relation adjacency,
    softmax over neighbors, aggregate, LayerNorm; relation outputs concat
    then squeeze-projected with a residual input map.
    """

    no_A: int
    features: int
    dropout: float = 0.3
    multi_head: int = 4  # unused in V1, kept for ctor parity
    ratio: int = 8

    @nn.compact
    def __call__(
        self, V: jnp.ndarray, adj: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N, _ = V.shape
        sq = self.features // self.ratio
        det = not train
        outputs = []
        eye = jnp.eye(N, dtype=V.dtype)
        for l in range(self.no_A + 1):
            W = self.param(f"W_{l}", _xavier_uniform, (V.shape[-1], sq))
            a = self.param(f"a_{l}", _xavier_uniform, (2 * sq, 1))
            h = V @ W  # (B, N, sq)
            # NOTE: the reference concatenates the (h_i, h_j) tiles along
            # dim=1 and then views to (B, N, N, 2sq) (gatv2.py:92-99),
            # which interleaves halves rather than forming [h_i || h_j].
            # Replicated op-for-op for numerical parity.
            hi = jnp.repeat(h, N, axis=1)  # (B, N*N, sq): row i*N+t = h_i
            hj = jnp.tile(h, (1, N, 1))  # (B, N*N, sq): row i*N+t = h_t
            e = jnp.concatenate([hi, hj], axis=1).reshape(B, N, N, 2 * sq)
            e = (e @ a)[..., 0]
            e = nn.leaky_relu(e, negative_slope=0.01)
            mask = adj[:, :, l, :] if l < self.no_A else eye[None]
            att = jnp.where(mask > 0, e, -9e15)
            att = jax.nn.softmax(att, axis=2)
            att = nn.Dropout(self.dropout, deterministic=det)(att)
            out = jnp.einsum("bnm,bmf->bnf", att, h)
            out = Norm(name=f"norm_{l}")(out, train)
            outputs.append(out)
        output = nn.Dense(self.features, name="squeeze")(
            jnp.concatenate(outputs, axis=-1)
        )
        if V.shape[-1] != self.features:
            output = output + nn.Dense(self.features, name="map")(V)
        else:
            output = output + V
        return output, adj


class GraphAttentionLayerV2(nn.Module):
    """GATv2 per-relation multi-head attention (reference: gatv2.py:152-268,
    following arXiv:2105.14491): scores from ``a_l · leaky_relu(W_src h_i
    + W_dst h_j)`` per head; heads share one softmax-weighted sum."""

    no_A: int
    features: int
    dropout: float = 0.3
    multi_head: int = 4
    ratio: int = 16

    @nn.compact
    def __call__(
        self, V: jnp.ndarray, adj: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N, _ = V.shape
        sq = self.features // self.ratio
        H = self.multi_head
        det = not train
        outputs = []
        eye = jnp.eye(N, dtype=V.dtype)
        feat_dropout = nn.Dropout(self.dropout, deterministic=det)
        for l in range(self.no_A + 1):
            W_src = self.param(f"W_src_{l}", _xavier_uniform, (V.shape[-1], sq * H))
            W_dst = self.param(f"W_dst_{l}", _xavier_uniform, (V.shape[-1], sq * H))
            a = self.param(f"a_{l}", _xavier_uniform, (1, 1, 1, H, sq))
            feats = feat_dropout(V)
            src = (feats @ W_src).reshape(B, N, H, sq)
            dst = (feats @ W_dst).reshape(B, N, H, sq)
            e = nn.leaky_relu(
                src[:, :, None, :, :] + dst[:, None, :, :, :], negative_slope=0.01
            )  # (B, N_i, N_j, H, sq)
            scores = jnp.sum(e * a[0, 0, 0], axis=-1)  # (B, N, N, H)
            mask = (adj[:, :, l, :] if l < self.no_A else eye[None])[..., None]
            att = jnp.where(mask > 0, scores, -9e15)
            att = jax.nn.softmax(att, axis=2)
            att = nn.Dropout(self.dropout, deterministic=det)(att)
            out = jnp.einsum("bnjh,bjhs->bns", att, src)
            out = Norm(name=f"norm_{l}")(out, train)
            outputs.append(out)
        output = nn.Dense(self.features, name="squeeze")(
            jnp.concatenate(outputs, axis=-1)
        )
        if V.shape[-1] != self.features:
            output = output + nn.Dense(self.features, name="map")(V)
        else:
            output = output + V
        return output, adj


class RelGraphAttention(nn.Module):
    """Per-relation masked multi-head GAT from IJCAI19 HGAT
    (reference: robust_gcn.py:103-170) — tanh-gated src/dst scores,
    heads = relations, outputs concatenated head-wise."""

    features: int
    n_head: int
    attn_dropout: float = 0.2
    use_bias: bool = True
    slope: float = 0.2

    @nn.compact
    def __call__(self, h: jnp.ndarray, adj: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, _ = h.shape
        det = not train
        w = self.param("w", _xavier_uniform, (self.n_head, h.shape[-1], self.features))
        a_src = self.param("a_src", _xavier_uniform, (self.n_head, self.features, 1))
        a_dst = self.param("a_dst", _xavier_uniform, (self.n_head, self.features, 1))
        h_prime = jnp.einsum("bnf,kfc->bknc", h, w)  # (B, heads, N, C)
        attn_src = jnp.einsum("bknc,kco->bkno", jnp.tanh(h_prime), a_src)[..., 0]
        attn_dst = jnp.einsum("bknc,kco->bkno", jnp.tanh(h_prime), a_dst)[..., 0]
        attn = attn_src[:, :, :, None] + attn_dst[:, :, None, :]
        attn = nn.leaky_relu(attn, negative_slope=self.slope)
        # adj (B, N, L, N) -> per-head mask (B, L, N, N)
        mask = 1.0 - jnp.transpose(adj, (0, 2, 1, 3))
        attn = jnp.where(mask > 0, -1e10, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=det)(attn)
        output = jnp.einsum("bknm,bkmc->bknc", attn, h_prime)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            output = output + bias
        return jnp.transpose(output, (0, 2, 1, 3)).reshape(
            B, N, self.features * self.n_head
        )


class MakeDenseGAT(nn.Module):
    """Dense-connectivity GAT stack (reference: gatv2.py:271-298)."""

    input_feature: int
    no_A: int
    repeat_time: int
    layer_cls: Any = GraphAttentionLayer
    drop: float = 0.3

    @nn.compact
    def __call__(
        self, V: jnp.ndarray, A: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        stacked = V
        for r in range(self.repeat_time):
            update, _ = self.layer_cls(
                self.no_A, self.input_feature, self.drop, name=f"layer_{r}"
            )(stacked, A, train)
            stacked = jnp.concatenate([stacked, update], axis=-1)
        out, _ = self.layer_cls(
            self.no_A, self.input_feature, self.drop, name="squeeze_block"
        )(stacked, A, train)
        return out, A


class DiffPooling(nn.Module):
    """Soft cluster pooling (reference: gatv2.py:311-373)."""

    out_feature: int
    output_node: int
    no_A: int = 4
    layer_cls: Any = GraphAttentionLayer
    drop: float = 0.3

    @nn.compact
    def __call__(self, X: jnp.ndarray, A: jnp.ndarray, train: bool = False):
        ratio = 16 if self.output_node != 1 else 1
        feat, _ = self.layer_cls(
            self.no_A, self.out_feature, self.drop, 4, ratio, name="feature_layer"
        )(X, A, train)
        assign, _ = self.layer_cls(
            self.no_A, self.output_node, self.drop, 4, ratio, name="adjacent_layer"
        )(X, A, train)
        X_feat = nn.relu(feat)
        S = jax.nn.softmax(assign, axis=-1)  # (B, N, output_node)
        S_T = jnp.swapaxes(S, 1, 2)
        if self.output_node == 1:
            out = nn.relu(jnp.einsum("bkn,bnf->bkf", S_T, X_feat))
            return out.reshape(-1, X.shape[2]), A
        X_out = nn.leaky_relu(jnp.einsum("bkn,bnf->bkf", S_T, X_feat), negative_slope=0.01)
        # A (B, N, L, N): pool both node dims.
        A_out = jnp.einsum("bkn,bnlm,bmj->bklj", S_T, A, S)
        A_out = nn.Dropout(self.drop, deterministic=not train)(A_out)
        return X_out, A_out


class TuneSequential(nn.Module):
    """Tuple-threading sequential (reference: gatv2.py:301-308): each stage
    may return ``(V, A)`` which is splatted into the next stage. The GATV2
    network composes its stages functionally and does not need this, but
    the combinator is exported for config-built custom stacks."""

    layers: Tuple[Any, ...]

    def __call__(self, *inputs: Any, train: bool = False) -> Any:
        out: Any = inputs
        for layer in self.layers:
            out = layer(*out, train=train) if isinstance(out, tuple) else layer(
                out, train=train
            )
        return out


class MakeParameterScale(nn.Module):
    """Single learnable scalar in [0, 1) at init
    (reference: gatv2.py:376-382)."""

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("parameter", nn.initializers.uniform(scale=1.0), (1,))


@register_model
class GATV2(nn.Module):
    """The exported GAT network (reference: gatv2.py:385-428)."""

    input_feature: int
    no_A: int = 6
    output_feature: int = 128
    num_classes: int = 36  # "class_" in the reference ctor (gatv2.py:391)
    use_v2: bool = True

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, jnp.ndarray], train: bool = False,
                 **_: Any) -> jnp.ndarray:
        V, A = inputs
        layer_cls = GraphAttentionLayerV2 if self.use_v2 else GraphAttentionLayer
        x, A = layer_cls(self.no_A, 256, 0.3, name="gat_in")(V, A, train)
        x, A = MakeDenseGAT(256, self.no_A, 2, layer_cls, 0.3, name="dense_gat")(
            x, A, train
        )
        x, A = layer_cls(self.no_A, 256, 0.3, name="gat_out")(x, A, train)
        # The reference builds the mlp activation as nn.LeakyReLU(True)
        # (gatv2.py:405): the positional True binds to negative_slope, so
        # the "activation" is slope-1.0 — the identity. Replicated
        # op-for-op for parity (tests/test_parity_networks.py).
        x = nn.Dense(self.output_feature, name="mlp")(x)
        return nn.Dense(self.num_classes, name="class_output")(x)

    @property
    def output_dim(self) -> int:
        return self.num_classes

    @staticmethod
    def l2_norm(x: jnp.ndarray) -> jnp.ndarray:
        """(reference: gatv2.py:404-414)."""
        norm = jnp.sqrt(jnp.sum(x * x, axis=2) + 1e-10)
        return x / norm[..., None]
