"""Core reusable layers of the model family.

Faithful re-designs (not ports) of the reference layer zoo
(reference: gnn/models/networks/robust_gcn.py:10-99,
 gnn/models/networks/drop_robust_gcn.py:13-28,
 gnn/models/networks/deep_rp_gcn.py:35-68). Compute is expressed as
MXU-shaped einsums/matmuls via :mod:`grl_tpu.ops`; DropEdge follows the
exact dropout-on-preprocessed-adjacency semantics of the reference.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from grl_tpu.ops.relconv import drop_edge, relational_neighbor_aggregate
from grl_tpu.ops.sparse import RelationalGraph, drop_edge_coo, relational_neighbor_coo
from grl_tpu.ops.tree import TreeGraph, tree_neighbor_aggregate
from grl_tpu.parallel.graph_partition import LocalShardGraph, _ring_aggregate_body

Adjacency = Union[jnp.ndarray, RelationalGraph, LocalShardGraph, TreeGraph]

SparseAdjacency = (RelationalGraph, LocalShardGraph, TreeGraph)

Dtype = Any  # jnp dtype or None (inherit input dtype)


def maybe_cast(x: Optional[jnp.ndarray], dtype: Optional[Dtype]) -> Optional[jnp.ndarray]:
    """Cast ``x`` to the compute dtype when mixed precision is enabled.

    Parameters stay float32 (flax's ``param_dtype`` default — the master
    copy the optimizer updates); activations and the adjacency are cast to
    ``dtype`` (typically bfloat16) so the hot matmuls run single-pass on
    the MXU and HBM traffic on the ``(B,N,L,N)`` operand halves.
    """
    if x is None or dtype is None:
        return x
    return x.astype(dtype)


def _xavier_normal(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Glorot-normal matching torch.nn.init.xavier_normal_ on a 2D weight."""
    fan_in, fan_out = shape[0], shape[1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class LinearReLU(nn.Module):
    """``Linear -> ReLU`` helper (reference: robust_gcn.py:10-11)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.relu(nn.Dense(self.features, dtype=self.dtype, name="linear")(x))


class GraphConv(nn.Module):
    """Multi-relational graph convolution (reference: robust_gcn.py:14-75).

    Aggregates per-relation neighbor features (self relation prepended) and
    projects the ``(L+1)*F`` concatenation with a single weight
    ``h_weights`` of shape ``((L+1)*F, C)`` plus bias.

    Accepts a dense ``(B, N, L, N)`` adjacency or a static-shape
    :class:`RelationalGraph` (flat ``(num_nodes, F)`` features).
    """

    features: int
    num_relations: int
    use_bias: bool = True
    # None inherits jax_default_matmul_precision: bf16-class on the MXU for
    # speed; tests/parity runs pin "highest" globally.
    precision: Optional[jax.lax.Precision] = None
    # Mixed-precision compute dtype (params stay float32); see maybe_cast.
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        V: jnp.ndarray,
        A: Adjacency,
        self_scale: Optional[jnp.ndarray] = None,
        edge_keep: Optional[jnp.ndarray] = None,
        precomputed_neigh: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        F = V.shape[-1]
        L1 = self.num_relations + 1
        h_weights = self.param("h_weights", _xavier_normal, (F * L1, self.features))
        h_weights = maybe_cast(h_weights, self.dtype)
        # Split-matmul formulation: the single reference weight
        # ``((L+1)F, C)`` is sliced (free under jit) into the self block
        # and the neighbor block, so the ``(B, N, (L+1)F)`` concatenation
        # copy never materializes in HBM. Same math as concat @ h_weights
        # (reference: robust_gcn.py:45-50), different add order only.
        w_self, w_neigh = h_weights[:F], h_weights[F:]
        if precomputed_neigh is not None:
            # e.g. from the fused Pallas kernel: (self_term, (B,N,L,F)).
            self_term, neigh = precomputed_neigh
            neigh = neigh.reshape(*neigh.shape[:-2], -1)
        elif isinstance(A, LocalShardGraph):
            # Partitioned path (inside shard_map): ring ppermute halo
            # exchange overlapped with local gather+segment-sum.
            w = A.weights if edge_keep is None else A.weights * edge_keep
            neigh = _ring_aggregate_body(
                V, A.senders, A.relations, A.receivers_local,
                w.astype(V.dtype), A.num_relations, A.shard_n, A.axis,
            )
            self_term = V if self_scale is None else V * self_scale[..., None]
        elif isinstance(A, RelationalGraph) and getattr(A, "kernel", None) is not None:
            # Pallas blocked-CSR kernel path (CSRAdjacency): DropEdge is
            # fused in-kernel via a stateless per-edge hash, so EdgeDropout
            # hands over (seed, rate) instead of a per-edge keep vector.
            if edge_keep is None:
                seed, rate = jnp.zeros((), jnp.int32), 0.0
            else:
                seed, rate = edge_keep
            tables = getattr(A, "kernel_tables", None)
            kernel_tbl = tables if tables is not None else getattr(
                A.kernel, "tables", None
            )
            self_term = V if self_scale is None else V * self_scale[..., None]
            if (
                getattr(kernel_tbl, "proj", None) is not None
                and F > self.features
            ):
                # PROJECT-FIRST (plan_projected kernels, width-reducing
                # convs): sum_r A_r @ (V W_r) == (sum_r A_r V) W_r by
                # associativity, but gathers run at the OUTPUT width C
                # instead of the input width F — gather transactions are
                # the op's binding resource, so when F > C (the
                # flagship's 512-wide concat conv) this halves them.
                L = self.num_relations
                Wr = w_neigh.reshape(L, F, self.features)
                Vr = jnp.einsum(
                    "nf,lfc->nlc", maybe_cast(V, self.dtype), Wr,
                    precision=self.precision,
                ).reshape(L * V.shape[0], self.features)
                neigh_term = A.kernel.neighbor_aggregate_projected(
                    Vr, seed, rate, tables=kernel_tbl
                )
                self_term = maybe_cast(self_term, self.dtype)
                out = (
                    jnp.matmul(self_term, w_self, precision=self.precision)
                    + maybe_cast(neigh_term, self.dtype)
                )
                if self.use_bias:
                    bias = self.param(
                        "bias",
                        lambda key, shape: 1e-4
                        + 5e-5 * jax.random.normal(key, shape),
                        (self.features,),
                    )
                    out = out + maybe_cast(bias, self.dtype)
                return out
            if tables is not None:
                # Threaded table pytree (the adjacency came through a
                # jit boundary as an argument): the tables are XLA
                # parameters, not program constants — essential for the
                # table-heavy tile kernel (csr_spmm.CSRAdjacency notes).
                neigh = A.kernel.neighbor_aggregate(
                    V, seed, rate, tables=tables
                )
            else:
                neigh = A.kernel.neighbor_aggregate(V, seed, rate)
        elif isinstance(A, TreeGraph):
            # Sampled-minibatch fast path: the tree's edge endpoints are
            # positional constants, so aggregation is reshape+einsum —
            # no gathers, no scatter-adds (grl_tpu/ops/tree.py).
            neigh = tree_neighbor_aggregate(V, A, edge_keep)
            self_term = V if self_scale is None else V * self_scale[..., None]
        elif isinstance(A, RelationalGraph):
            neigh = relational_neighbor_coo(V, A, edge_keep)
            self_term = V if self_scale is None else V * self_scale[..., None]
        else:
            neigh = relational_neighbor_aggregate(V, A, precision=self.precision)
            self_term = V if self_scale is None else V * self_scale[..., None]
        self_term = maybe_cast(self_term, self.dtype)
        neigh = maybe_cast(neigh, self.dtype)
        out = jnp.matmul(self_term, w_self, precision=self.precision) + jnp.matmul(
            neigh, w_neigh, precision=self.precision
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: 1e-4 + 5e-5 * jax.random.normal(key, shape),
                (self.features,),
            )
            out = out + maybe_cast(bias, self.dtype)
        return out


class EdgeDropout(nn.Module):
    """DropEdge on the (logically) preprocessed adjacency.

    Matches ``nn.Dropout(p)`` applied to the reference's preprocessed
    ``(B,(L+1)N,N)`` operand — iid keep, 1/(1-p) rescale, self-loops
    included (reference: drop_robust_gcn.py:38,69,76).
    Returns dropout artifacts to pass to :class:`GraphConv`.
    """

    rate: float = 0.3

    @nn.compact
    def __call__(self, A: Adjacency, deterministic: bool):
        if deterministic or self.rate <= 0.0:
            return (A, None) if not isinstance(A, SparseAdjacency) else (None, None)
        key = self.make_rng("dropout")
        if isinstance(A, RelationalGraph) and getattr(A, "kernel", None) is not None:
            # CSRAdjacency: the per-edge mask is regenerated inside the
            # Pallas kernel from (seed, global edge id); only the self-loop
            # mask (dense DropEdge hits the identity block too —
            # reference: drop_robust_gcn.py:69,76) is drawn here.
            k_seed, k_self = jax.random.split(key)
            seed = jax.random.randint(
                k_seed, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            keep = 1.0 - self.rate
            self_mask = jax.random.bernoulli(k_self, keep, (A.num_nodes,))
            self_scale = self_mask.astype(jnp.float32) / keep
            return (seed, self.rate), self_scale
        if isinstance(A, SparseAdjacency):
            # LocalShardGraph duck-types RelationalGraph here (num_nodes =
            # shard_n); the caller folds the device index into the rng so
            # shards draw independent masks.
            edge_keep, self_scale = drop_edge_coo(key, A, self.rate)
            return edge_keep, self_scale
        A_dropped, self_scale = drop_edge(key, A, self.rate)
        return A_dropped, self_scale


class NodeSelfAtten(nn.Module):
    """SAGAN-style global node self-attention (reference: robust_gcn.py:78-99).

    ``softmax(f(V) g(V)^T) h(V)`` with a learned per-channel gamma gate.
    Dense ``N x N`` attention — appropriate at document scale (N ~ 1e2-1e3);
    the sparse/blockwise path is used for OGB-scale graphs.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, V: jnp.ndarray) -> jnp.ndarray:
        f_out = LinearReLU(self.features // 8, dtype=self.dtype, name="f")(V)
        g_out = LinearReLU(self.features // 8, dtype=self.dtype, name="g")(V)
        h_out = LinearReLU(self.features, dtype=self.dtype, name="h")(V)
        scores = jnp.einsum("bnk,bmk->bnm", f_out, g_out)
        # Softmax in float32 for numerical stability under bf16 compute.
        s = maybe_cast(jax.nn.softmax(scores.astype(jnp.float32), axis=-1), self.dtype)
        o = jnp.einsum("bnm,bmf->bnf", s, h_out)
        gamma = self.param(
            "gamma", lambda key, shape: jax.random.normal(key, shape), (self.features,)
        )
        return maybe_cast(gamma, self.dtype) * o + V


class SparseNodeSelfAtten(nn.Module):
    """Edge-restricted node self-attention over a :class:`RelationalGraph`.

    The sparse analog of :class:`NodeSelfAtten` (reference:
    gnn/models/networks/robust_gcn.py:78-99): instead of the dense
    ``softmax(f V (g V)^T)`` over all ``N^2`` pairs, attention scores are
    computed only on graph edges (SDDMM), normalized per receiver with a
    segment softmax, and aggregated with a masked segment-sum SpMM — the
    O(E) form that scales to OGB-size graphs where the dense ``N x N``
    tensor cannot exist. On a fully-connected graph (plus self-loops) it
    reproduces the dense layer exactly (tests/test_sparse_path.py).
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, V: jnp.ndarray, graph: "RelationalGraph") -> jnp.ndarray:
        from grl_tpu.ops.segment import segment_softmax, segment_sum

        f_out = LinearReLU(self.features // 8, dtype=self.dtype, name="f")(V)
        g_out = LinearReLU(self.features // 8, dtype=self.dtype, name="g")(V)
        h_out = LinearReLU(self.features, dtype=self.dtype, name="h")(V)
        atten_kernel = getattr(graph, "atten_kernel", None)
        if atten_kernel is not None:
            # Fused ELL-table path: SDDMM + masked row softmax + weighted
            # reduce in one Pallas kernel per degree bucket, scatter-free
            # backward (grl_tpu/ops/pallas/sparse_attention.py). Planned
            # host-side by attach_kernel(attention=True).
            o = atten_kernel.attend(f_out, g_out, h_out)
        else:
            send, recv, mask = graph.senders, graph.receivers, graph.mask
            # SDDMM: scores only on edges (recv attends to send).
            scores = jnp.sum(f_out[recv] * g_out[send], axis=-1)
            alpha = segment_softmax(
                scores.astype(jnp.float32), recv, graph.num_nodes, mask=mask
            )
            alpha = maybe_cast(alpha, self.dtype or V.dtype)
            o = segment_sum(h_out[send] * alpha[:, None], recv, graph.num_nodes)
        gamma = self.param(
            "gamma", lambda key, shape: jax.random.normal(key, shape), (self.features,)
        )
        return maybe_cast(gamma, self.dtype) * o.astype(V.dtype) + V


class RanPAC(nn.Module):
    """Frozen random projection (RanPAC).

    The kernel lives in the ``constants`` collection so it is excluded from
    optimization — the functional analog of ``requires_grad = False``
    (reference: drop_robust_gcn.py:13-28, rp_robust_gcn.py:13-26,
    deep_rp_gcn.py:17-32 — three near-duplicate copies unified here).

    ``init_scale`` folds the reference's ``sqrt(out_dim) * lambda`` weight
    scaling (rp_robust_gcn.py:23) into the frozen kernel; the call-time
    ``scale`` covers the schedulable ``lambda_value`` multiplier
    (deep_rp_gcn.py:30-32).
    """

    features: int
    init_scale: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: float | jnp.ndarray = 1.0) -> jnp.ndarray:
        def init_kernel() -> jnp.ndarray:
            key = self.make_rng("constants")
            shape = (x.shape[-1], self.features)
            return jax.random.normal(key, shape) * self.init_scale

        kernel = self.variable("constants", "kernel", init_kernel)
        return (x @ maybe_cast(kernel.value, self.dtype)) * scale


class BatchNorm(nn.Module):
    """BatchNorm over (batch, node) dims per channel.

    Equivalent to the reference's ``nn.BatchNorm1d`` applied to permuted
    ``(B, C, N)`` activations (reference: deep_rp_gcn.py:35-68). Note: like
    the reference, statistics include padded nodes; masked statistics are a
    deliberate behavioral deviation we expose via ``mask`` for callers that
    want correctness over parity.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        norm = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            name="bn",
        )
        if mask is None:
            return norm(x)
        # Masked statistics: compute on valid nodes only by weighting.
        if train:
            w = mask[..., None].astype(x.dtype)
            count = jnp.maximum(w.sum(), 1.0)
            mean = (x * w).sum(axis=(0, 1)) / count
            var = ((x - mean) ** 2 * w).sum(axis=(0, 1)) / count
            scale = self.param("mask_scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("mask_bias", nn.initializers.zeros, (x.shape[-1],))
            return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return norm(x)


class GCNBlock(nn.Module):
    """GraphConv + BatchNorm + LeakyReLU(0.2) (reference: deep_rp_gcn.py:35-51)."""

    features: int
    num_relations: int

    @nn.compact
    def __call__(
        self,
        V: jnp.ndarray,
        A: Adjacency,
        train: bool,
        self_scale: Optional[jnp.ndarray] = None,
        edge_keep: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x = GraphConv(self.features, self.num_relations, name="gcn")(
            V, A, self_scale, edge_keep
        )
        x = BatchNorm(name="norm")(x, train)
        return nn.leaky_relu(x, negative_slope=0.2)


class EmbeddingBlock(nn.Module):
    """Linear + BatchNorm + LeakyReLU(0.2) (reference: deep_rp_gcn.py:54-68)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Dense(self.features, name="emb")(x)
        x = BatchNorm(name="norm")(x, train)
        return nn.leaky_relu(x, negative_slope=0.2)
