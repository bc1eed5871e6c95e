"""Sparse (COO) multi-relational aggregation with static shapes.

The reference stores every graph as a dense ``N x L x N`` float16 tensor
(reference: gnn/data_generator/data_process/utils/graph_utils.py:782-834)
which costs O(L·N²) memory and FLOPs even though document graphs have
O(N) edges. The TPU build keeps a bucketed, padding-masked COO edge list
per sample so big graphs (ogbn-scale) pay O(E·F):

  senders   (E,) int32   source node ids
  receivers (E,) int32   destination node ids
  relations (E,) int32   relation/edge-type ids in [0, L)
  weights   (E,) float   edge weights (1.0 for normal_binary graphs)
  mask      (E,) bool    False for padding edges

``E`` is padded to a bucket size so jit compiles once per bucket.
Aggregation is a gather + segment-sum; DropEdge becomes an edge-mask
bernoulli draw fused into the same pass — no dense mask tensor.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class RelationalGraph:
    """Static-shape sparse multi-relational graph (single sample or batch).

    For a batch, node ids are offset into a flat ``B*N`` node space,
    ``num_nodes`` is ``B*N`` and ``batch_shape`` records ``(B, N)`` so
    per-document dense blocks (NodeSelfAtten) can unflatten.

    A flax.struct pytree (not a NamedTuple) so the integer metadata is
    static aux data: a RelationalGraph can be passed straight through
    ``jax.jit`` argument boundaries — the edge arrays trace, the sizes
    specialize the compilation (one executable per edge/node bucket).
    """

    senders: jnp.ndarray  # (E,) int32
    receivers: jnp.ndarray  # (E,) int32
    relations: jnp.ndarray  # (E,) int32
    weights: jnp.ndarray  # (E,) float32
    mask: jnp.ndarray  # (E,) bool
    num_nodes: int = flax.struct.field(pytree_node=False)
    num_relations: int = flax.struct.field(pytree_node=False)
    batch_shape: Optional[Tuple[int, int]] = flax.struct.field(
        pytree_node=False, default=None
    )


def dense_to_relational_coo(
    A: np.ndarray,
    edge_bucket: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Convert a dense ``(N, L, N)`` adjacency into padded COO arrays.

    Host-side (numpy) — runs in the data pipeline, not under jit.
    Returns ``(senders, receivers, relations, weights, mask)``.
    """
    N, L, _ = A.shape
    recv, rel, send = np.nonzero(A)
    weights = A[recv, rel, send].astype(np.float32)
    E = len(send)
    cap = E if edge_bucket is None else edge_bucket
    if E > cap:
        raise ValueError(f"edge bucket {cap} too small for {E} edges")
    pad = cap - E

    def _pad(x: np.ndarray, value: int = 0) -> np.ndarray:
        return np.concatenate([x, np.full((pad,), value, dtype=x.dtype)])

    return (
        _pad(send.astype(np.int32)),
        _pad(recv.astype(np.int32)),
        _pad(rel.astype(np.int32)),
        _pad(weights, 0),
        np.concatenate([np.ones(E, bool), np.zeros(pad, bool)]),
    )


def batch_relational_coo(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    relations: jnp.ndarray,
    weights: jnp.ndarray,
    mask: jnp.ndarray,
    nodes_per_sample: int,
    num_relations: int,
) -> RelationalGraph:
    """Stacked per-sample COO ``(B, E)`` -> one flat batch graph.

    Node ids are offset by ``b * nodes_per_sample`` into a ``B*N`` node
    space (documents stay disconnected); ``batch_shape`` keeps ``(B, N)``
    so per-document dense blocks can unflatten. Jit-safe (static shapes).
    """
    B, _ = senders.shape
    offs = (jnp.arange(B, dtype=jnp.int32) * nodes_per_sample)[:, None]
    return RelationalGraph(
        senders=(senders + offs).reshape(-1),
        receivers=(receivers + offs).reshape(-1),
        relations=relations.reshape(-1),
        weights=weights.reshape(-1),
        mask=mask.reshape(-1),
        num_nodes=B * nodes_per_sample,
        num_relations=num_relations,
        batch_shape=(B, nodes_per_sample),
    )


def relational_aggregate_coo(
    V: jnp.ndarray,
    graph: RelationalGraph,
    self_scale: Optional[jnp.ndarray] = None,
    edge_keep: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sparse equivalent of :func:`grl_tpu.ops.relconv.relational_aggregate`.

    Args:
        V: flat node features ``(num_nodes, F)``.
        graph: static-shape COO graph.
        self_scale: optional ``(num_nodes,)`` self-loop scale (DropEdge).
        edge_keep: optional ``(E,)`` float edge keep-scale (DropEdge mask
            already divided by keep-prob), fused into the edge weights.

    Returns:
        ``(num_nodes, (L+1)*F)`` in the same ``[self | rel_0 | ...]`` layout
        as the dense path, so the same projection weights apply.
    """
    agg = relational_neighbor_coo(V, graph, edge_keep)
    self_term = V if self_scale is None else V * self_scale[:, None]
    return jnp.concatenate([self_term, agg], axis=-1)


def relational_neighbor_coo(
    V: jnp.ndarray,
    graph: RelationalGraph,
    edge_keep: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Neighbor-only COO aggregation ``(num_nodes, L*F)`` — no self/concat.

    Edge weights and the DropEdge keep-scale are cast to ``V.dtype`` so a
    bf16 compute dtype halves the gather traffic (the dominant HBM cost);
    the segment-sum accumulates in float32 regardless and the result is
    cast back, keeping high-degree sums accurate.
    """
    F = V.shape[-1]
    L = graph.num_relations
    w = (graph.weights * graph.mask.astype(graph.weights.dtype)).astype(V.dtype)
    if edge_keep is not None:
        w = w * edge_keep.astype(V.dtype)
    messages = V[graph.senders] * w[:, None]  # (E, F)
    # Scatter into a (num_nodes * L) segment space: relation-major per node.
    seg = graph.receivers * L + graph.relations
    agg = jax.ops.segment_sum(
        messages.astype(jnp.float32), seg, num_segments=graph.num_nodes * L
    )
    return agg.reshape(graph.num_nodes, L * F).astype(V.dtype)


def drop_edge_coo(
    key: jax.Array,
    graph: RelationalGraph,
    rate: float,
    deterministic: bool = False,
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Sample DropEdge masks for the sparse path.

    Matches the dense semantics (iid keep with 1/(1-p) rescale, self-loops
    included — reference: gnn/models/networks/drop_robust_gcn.py:38,76).
    Returns ``(edge_keep, self_scale)`` for
    :func:`relational_aggregate_coo`.
    """
    if deterministic or rate <= 0.0:
        return None, None
    keep = 1.0 - rate
    k_edge, k_self = jax.random.split(key)
    # weights.shape == senders.shape on COO graphs; TreeGraph (implied
    # endpoints, per-edge weights only) duck-types through this too.
    edge_mask = jax.random.bernoulli(k_edge, keep, graph.weights.shape)
    self_mask = jax.random.bernoulli(k_self, keep, (graph.num_nodes,))
    scale = 1.0 / keep
    return edge_mask.astype(jnp.float32) * scale, self_mask.astype(jnp.float32) * scale
