"""The RobustGCN / DropEdge GCN network family.

Re-designs of the reference networks (reference:
gnn/models/networks/robust_gcn.py:173-231,
gnn/models/networks/drop_robust_gcn.py:31-103,
gnn/models/networks/rp_robust_gcn.py:29-115,
gnn/models/networks/mod_gcn.py:11-98). All share a 3-GraphConv trunk with
dense skip-concats; they differ in DropEdge, concat order, RanPAC placement
and classifier head. The trunk is factored once here (the reference repeats
it in each file).

Call convention: ``model.apply(variables, (V, A), train=..., rngs=...)``
with ``V (B, N, F_in)`` and ``A (B, N, L, N)`` in dataset layout, or a
:class:`grl_tpu.ops.sparse.RelationalGraph` with flat ``(num_nodes, F)``
features for the sparse path.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from grl_tpu.models.base import register_model
from grl_tpu.models.cosine_linear import CosineLinear, SplitCosineLinear
from grl_tpu.models.layers import (
    EdgeDropout,
    GraphConv,
    LinearReLU,
    NodeSelfAtten,
    RanPAC,
    SparseNodeSelfAtten,
    maybe_cast,
)
from grl_tpu.ops.sparse import RelationalGraph

Inputs = Tuple[jnp.ndarray, Any]


class GCNTrunk(nn.Module):
    """emb1 -> 3x GraphConv with skip-concats -> emb2 (-> self-attention).

    ``edge_dropout_rate > 0`` redraws an independent DropEdge mask per GCN
    layer, like the reference's repeated ``self.edge_dropout(A)`` calls
    (reference: drop_robust_gcn.py:76-85). ``g1_first`` selects the concat
    order: DropEdge-family nets use ``[g1, g2]``/``[g1, g3]``
    (drop_robust_gcn.py:84-88), RobustGCN uses ``[g2, g1]``/``[g3, g1]``
    (robust_gcn.py:216-220).
    """

    net_size: int = 256
    num_edges: int = 6
    dropout_rate: float = 0.5
    edge_dropout_rate: float = 0.3
    g1_first: bool = True
    use_attention: bool = True
    # Attention on the sparse path: "dense" unflattens to (B, N, F) and
    # runs the reference's per-document dense NodeSelfAtten; "sparse" runs
    # the O(E) edge-restricted segment-softmax attention (big graphs).
    attention_impl: str = "dense"
    # "xla" (default) or "pallas": the fused DropEdge+aggregation TPU
    # kernel (grl_tpu/ops/pallas/relagg.py). Pallas requires the node
    # dimension padded to a multiple of 128.
    kernel_impl: str = "xla"
    # Mixed precision: e.g. "bfloat16" casts activations + adjacency to
    # bf16 (params stay f32 master copies) — single-pass MXU matmuls and
    # half the HBM traffic on the dominant (B,N,L,N) operand.
    compute_dtype: Optional[str] = None

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    def _pallas_agg(
        self, feats: jnp.ndarray, A: jnp.ndarray, det: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused-kernel aggregation: ``(self_term, neigh (B,N,L,F))``."""
        import jax

        from grl_tpu.ops.pallas import (
            pallas_dropedge_aggregate,
            pallas_neighbor_aggregate,
        )

        B, N, F = feats.shape
        if det or self.edge_dropout_rate <= 0.0:
            neigh = pallas_neighbor_aggregate(feats, A)
            self_term = feats
        else:
            key = self.make_rng("dropout")
            k_seed, k_self = jax.random.split(key)
            seed = jax.random.randint(k_seed, (), 0, 2**31 - 1, dtype=jnp.int32)
            neigh = pallas_dropedge_aggregate(
                feats, A, seed, self.edge_dropout_rate
            )
            keep = 1.0 - self.edge_dropout_rate
            self_mask = jax.random.bernoulli(k_self, keep, (B, N))
            self_term = feats * (self_mask.astype(feats.dtype) / keep)[..., None]
        return self_term, neigh

    @nn.compact
    def __call__(
        self, inputs: Inputs, train: bool = False, first_only: bool = False
    ) -> jnp.ndarray:
        V, A = inputs
        det = not train
        from grl_tpu.models.layers import SparseAdjacency

        sparse = isinstance(A, SparseAdjacency)
        dtype = self._dtype
        V = maybe_cast(V, dtype)
        if not sparse:
            A = maybe_cast(A, dtype)
        dropout = nn.Dropout(self.dropout_rate, deterministic=det)
        edge_dropout = EdgeDropout(self.edge_dropout_rate, name="edge_dropout")

        if first_only:
            # emb1 -> gcn1 -> relu, no dropout of any kind
            # (reference: mod_gcn.py:73-90 get_first_node_emb).
            emb = LinearReLU(self.net_size, dtype=dtype, name="emb1")(V)
            return nn.relu(
                GraphConv(self.net_size, self.num_edges, dtype=dtype, name="gcn1")(emb, A)
            )

        embedding = dropout(LinearReLU(self.net_size, dtype=dtype, name="emb1")(V))

        def gcn(name: str, feats: jnp.ndarray, width: int) -> jnp.ndarray:
            conv = GraphConv(width, self.num_edges, dtype=dtype, name=name)
            if sparse:
                if (
                    self.kernel_impl != "xla"
                    and isinstance(A, RelationalGraph)
                    and getattr(A, "kernel", None) is None
                ):
                    raise ValueError(
                        f"kernel_impl={self.kernel_impl!r} on a sparse "
                        "RelationalGraph with no planned kernel: attach one "
                        "with grl_tpu.ops.kernels.attach_kernel (static "
                        "graphs / FullGraphProcedure do this automatically) "
                        "or set kernel_impl='xla' for per-batch COO graphs."
                    )
                edge_keep, self_scale = edge_dropout(A, det)
                out = conv(feats, A, self_scale, edge_keep)
            elif self.kernel_impl == "pallas":
                out = conv(feats, A, precomputed_neigh=self._pallas_agg(feats, A, det))
            else:
                A_used, self_scale = edge_dropout(A, det)
                out = conv(feats, A_used, self_scale)
            return dropout(nn.relu(out))

        g1 = gcn("gcn1", embedding, self.net_size)
        g2 = gcn("gcn2", g1, self.net_size)
        cat12 = [g1, g2] if self.g1_first else [g2, g1]
        g3 = gcn("gcn3", jnp.concatenate(cat12, axis=-1), self.net_size)
        cat13 = [g1, g3] if self.g1_first else [g3, g1]
        new_v = LinearReLU(self.net_size // 2, dtype=dtype, name="emb2")(
            jnp.concatenate(cat13, axis=-1)
        )
        if self.use_attention:
            half = self.net_size // 2
            if sparse and not isinstance(A, RelationalGraph):
                raise ValueError(
                    "NodeSelfAtten is global over nodes and cannot run on a "
                    "node-partitioned shard; build partitioned models with "
                    "use_attention=False (the reference never runs attention "
                    "at beyond-one-device graph sizes either)."
                )
            if sparse and self.attention_impl == "sparse":
                new_v = SparseNodeSelfAtten(half, dtype=dtype, name="self_atten")(
                    new_v, A
                )
            elif sparse:
                if A.batch_shape is None:
                    raise ValueError(
                        "Dense NodeSelfAtten on a flat sparse graph needs "
                        "batch_shape to unflatten; set attention_impl='sparse' "
                        "or use_attention=False for single large graphs."
                    )
                B_, N_ = A.batch_shape
                new_v = NodeSelfAtten(half, dtype=dtype, name="self_atten")(
                    new_v.reshape(B_, N_, -1)
                ).reshape(B_ * N_, -1)
            else:
                new_v = NodeSelfAtten(half, dtype=dtype, name="self_atten")(new_v)
        return new_v


@register_model
class GraphCNNDropEdge(nn.Module):
    """The flagship KV-extraction model (reference: drop_robust_gcn.py:31-103).

    Trunk + frozen RanPAC expansion (``half_net * rp_factor``, plain N(0,1)
    init — drop_robust_gcn.py:25,56-58) + linear classifier.
    """

    input_dim: int
    output_dim: int
    num_edges: int
    net_size: int = 256
    use_attention: bool = True
    attention_impl: str = "dense"  # sparse path: "dense" per-doc | "sparse" O(E)
    rp_factor: int = 10  # RP_FACTOR (reference: drop_robust_gcn.py:10)
    dropout_rate: float = 0.5
    edge_dropout_rate: float = 0.3
    kernel_impl: str = "xla"  # "pallas" = fused DropEdge+aggregation kernel
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" mixed precision

    def trunk_features(self, inputs: Inputs, train: bool = False) -> jnp.ndarray:
        return GCNTrunk(
            net_size=self.net_size,
            num_edges=self.num_edges,
            dropout_rate=self.dropout_rate,
            edge_dropout_rate=self.edge_dropout_rate,
            g1_first=True,
            use_attention=self.use_attention,
            attention_impl=self.attention_impl,
            kernel_impl=self.kernel_impl,
            compute_dtype=self.compute_dtype,
            name="trunk",
        )(inputs, train)

    @nn.compact
    def __call__(
        self,
        inputs: Inputs,
        train: bool = False,
        head_rows: Optional[Tuple[int, int, int]] = None,
        **_: Any,
    ) -> jnp.ndarray:
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        new_v = self.trunk_features(inputs, train)
        if head_rows is not None:
            # (groups, rows_per_group, keep): run the RanPAC expansion +
            # classifier ONLY on the first `keep` rows of each group —
            # the sampled-minibatch path's tree slots beyond level 0
            # carry no labels, and the head (the network's widest
            # matmuls: half_net*rp_factor = 1280 wide) is ~26% of the
            # step when computed for all fanout slots. Full-graph and
            # dense paths pass None (every row is a labeled node).
            G, rows, keep = head_rows
            new_v = new_v.reshape(G, rows, new_v.shape[-1])[:, :keep]
            new_v = new_v.reshape(G * keep, new_v.shape[-1])
        rp_size = (self.net_size // 2) * self.rp_factor
        new_v = nn.relu(RanPAC(rp_size, dtype=dtype, name="w_rand")(new_v))
        new_v = nn.Dropout(self.dropout_rate, deterministic=not train)(new_v)
        logits = nn.Dense(self.output_dim, dtype=dtype, name="classifier")(new_v)
        # Loss/softmax always in float32.
        return logits.astype(jnp.float32)


@register_model
class RobustGCN(nn.Module):
    """No-DropEdge trunk + gcn4/gcn5 tail (reference: robust_gcn.py:173-231)."""

    input_dim: int
    output_dim: int
    num_edges: int
    net_size: int = 256
    use_attention: bool = True
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False, **_: Any) -> jnp.ndarray:
        _, A = inputs
        det = not train
        dropout = nn.Dropout(self.dropout_rate, deterministic=det)
        new_v = GCNTrunk(
            net_size=self.net_size,
            num_edges=self.num_edges,
            dropout_rate=self.dropout_rate,
            edge_dropout_rate=0.0,
            g1_first=False,
            use_attention=self.use_attention,
            name="trunk",
        )(inputs, train)
        new_v = dropout(new_v)
        half = self.net_size // 2
        g4 = dropout(nn.relu(GraphConv(half, self.num_edges, name="gcn4")(new_v, A)))
        g5 = nn.relu(GraphConv(half, self.num_edges, name="gcn5")(g4, A))
        return nn.Dense(self.output_dim, name="classifier")(g5)


@register_model
class RPGraphCNNDropEdge(nn.Module):
    """DropEdge trunk + two scaled RanPAC layers (reference: rp_robust_gcn.py:29-115).

    The RanPAC kernels are scaled ``sqrt(rp_size) * lambda_value`` at init
    (rp_robust_gcn.py:23); attention runs at ``rp_size`` width.
    """

    input_dim: int
    output_dim: int
    num_edges: int
    net_size: int = 256
    use_attention: bool = True
    rp_size: int = 10000
    lambda_value: float = 0.05
    dropout_rate: float = 0.5
    edge_dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False, **_: Any) -> jnp.ndarray:
        new_v = GCNTrunk(
            net_size=self.net_size,
            num_edges=self.num_edges,
            dropout_rate=self.dropout_rate,
            edge_dropout_rate=self.edge_dropout_rate,
            g1_first=True,
            use_attention=False,
            name="trunk",
        )(inputs, train)
        init_scale = (self.rp_size ** 0.5) * self.lambda_value
        new_v = nn.leaky_relu(
            RanPAC(self.rp_size, init_scale=init_scale, name="rp_emb")(new_v),
            negative_slope=0.01,
        )
        if self.use_attention:
            new_v = NodeSelfAtten(self.rp_size, name="self_atten")(new_v)
        new_v = nn.leaky_relu(
            RanPAC(self.rp_size, init_scale=init_scale, name="rp_final")(new_v),
            negative_slope=0.01,
        )
        new_v = nn.Dropout(self.dropout_rate, deterministic=not train)(new_v)
        return nn.Dense(self.output_dim, name="classifier")(new_v)


@register_model
class ModGCN(nn.Module):
    """DropEdge trunk + cosine classifier for class-incremental learning
    (reference: mod_gcn.py:11-98)."""

    input_dim: int
    output_dim: int
    num_edges: int
    prev_output_dim: Optional[int] = None
    net_size: int = 256
    use_attention: bool = True
    dropout_rate: float = 0.5
    edge_dropout_rate: float = 0.3

    def _trunk(self) -> GCNTrunk:
        return GCNTrunk(
            net_size=self.net_size,
            num_edges=self.num_edges,
            dropout_rate=self.dropout_rate,
            edge_dropout_rate=self.edge_dropout_rate,
            g1_first=True,
            use_attention=self.use_attention,
            name="trunk",
        )

    @nn.compact
    def __call__(
        self,
        inputs: Inputs,
        train: bool = False,
        mode: Optional[str] = None,
        return_feats: bool = False,
        **_: Any,
    ):
        det = not train
        trunk = self._trunk()
        if mode == "first_node_emb":
            return trunk(inputs, train, first_only=True)
        feats = trunk(inputs, train)
        feats = nn.Dropout(self.dropout_rate, deterministic=det)(feats)
        if mode == "node_emb":
            return feats
        if self.prev_output_dim:
            logits = SplitCosineLinear(
                self.prev_output_dim, self.output_dim, name="classifier"
            )(feats)
        else:
            logits = CosineLinear(self.output_dim, name="classifier")(feats)
        if return_feats:
            return logits, feats
        return logits
