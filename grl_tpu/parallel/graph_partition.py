"""Node/edge-partitioned aggregation across chips — the SP equivalent.

The reference has no large-graph story: graphs are densely padded per
batch, O(N²·L) memory (reference: gnn/data_generator/data_collate/
numpy_padding.py:63-103, SURVEY.md §2.6). Here a big graph's nodes are
sharded over a mesh axis; each device owns the edges whose *receiver* is
local; sender features arrive via a ring of ``ppermute`` block rotations
overlapped with local gather+segment-sum — the halo exchange rides ICI
while the previous block's messages accumulate.

Host-side planning (:func:`partition_graph`) buckets edges by receiver
shard with equal padded per-shard edge counts so the shard_map body is
static-shape.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec


class PartitionedGraph(NamedTuple):
    """Edge lists partitioned by receiver shard.

    All arrays lead with the device axis ``D``:
      senders   (D, Es) global sender ids
      receivers (D, Es) global receiver ids (receiver // shard_n == d)
      relations (D, Es)
      weights   (D, Es)
      mask      (D, Es)
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    relations: jnp.ndarray
    weights: jnp.ndarray
    mask: jnp.ndarray
    num_nodes: int  # padded global node count (divisible by D)
    num_relations: int


def partition_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    relations: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    num_relations: int,
    num_shards: int,
    edge_quantum: int = 1024,
) -> PartitionedGraph:
    """Bucket edges by receiver shard with equal padded per-shard counts."""
    shard_n = -(-num_nodes // num_shards)
    padded_nodes = shard_n * num_shards
    owner = receivers // shard_n
    counts = np.bincount(owner, minlength=num_shards)
    per_shard = int(max(1, counts.max()))
    per_shard = -(-per_shard // edge_quantum) * edge_quantum

    shp = (num_shards, per_shard)
    out = {
        "senders": np.zeros(shp, np.int32),
        "receivers": np.zeros(shp, np.int32),
        "relations": np.zeros(shp, np.int32),
        "weights": np.zeros(shp, np.float32),
        "mask": np.zeros(shp, bool),
    }
    for d in range(num_shards):
        sel = owner == d
        n = int(sel.sum())
        out["senders"][d, :n] = senders[sel]
        # Padding receivers point at the shard's first node; mask kills them.
        out["receivers"][d, :n] = receivers[sel]
        out["receivers"][d, n:] = d * shard_n
        out["relations"][d, :n] = relations[sel]
        out["weights"][d, :n] = weights[sel]
        out["mask"][d, :n] = True
    return PartitionedGraph(
        senders=jnp.asarray(out["senders"]),
        receivers=jnp.asarray(out["receivers"]),
        relations=jnp.asarray(out["relations"]),
        weights=jnp.asarray(out["weights"]),
        mask=jnp.asarray(out["mask"]),
        num_nodes=padded_nodes,
        num_relations=num_relations,
    )


class LocalShardGraph(NamedTuple):
    """Device-local view of a :class:`PartitionedGraph` INSIDE a shard_map
    body — the adjacency type the model family's GraphConv accepts on the
    partitioned path (the SP-analog of a sequence shard). ``senders`` stay
    global (the ring rotation resolves them); ``receivers_local`` are
    block-local output rows; ``weights`` are pre-masked.
    """

    senders: jnp.ndarray  # (Es,) global sender ids
    receivers_local: jnp.ndarray  # (Es,) block-local receiver rows
    relations: jnp.ndarray  # (Es,)
    weights: jnp.ndarray  # (Es,) mask-multiplied
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
    """Per-device ring: rotate V blocks, accumulate local messages."""
    D = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    F = V_block.shape[-1]
    L = num_relations
    seg = receivers_local * L + relations
    perm = [(i, (i + 1) % D) for i in range(D)]

    def step(k, carry):
        acc, block = carry
        # The block currently held originated on device (d - k) mod D.
        src_dev = jax.lax.rem(d - k + D, D)
        in_block = (senders // shard_n) == src_dev
        w = jnp.where(in_block, weights, 0.0)
        msgs = block[senders % shard_n] * w[:, None]
        acc = acc + jax.ops.segment_sum(msgs, seg, num_segments=shard_n * L)
        # Rotate AFTER consuming: XLA overlaps the collective-permute DMA
        # with the next iteration's gather/segment-sum.
        block = jax.lax.ppermute(block, axis, perm)
        return acc, block

    acc0 = jnp.zeros((shard_n * L, F), V_block.dtype)
    # Mark the fresh accumulator as device-varying so the loop carry type
    # matches the varying segment-sum outputs (shard_map vma typing).
    acc0 = jax.lax.pvary(acc0, (axis,))
    acc, _ = jax.lax.fori_loop(0, D, step, (acc0, V_block))
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
    spec_edges = P(axis, None)
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
    segment-sum. Simpler, more HBM + ICI traffic; used as the reference
    implementation in partition parity tests and for small D."""
    D = mesh.shape[axis]
    shard_n = graph.num_nodes // D
    L = graph.num_relations

    def per_device(V_block, senders, receivers, relations, weights, mask):
        senders, receivers = senders[0], receivers[0]
        relations = relations[0]
        weights = (weights[0] * mask[0]).astype(V_block.dtype)
        d = jax.lax.axis_index(axis)
        V_full = jax.lax.all_gather(V_block, axis, axis=0).reshape(-1, V_block.shape[-1])
        msgs = V_full[senders] * weights[:, None]
        seg = (receivers - d * shard_n) * L + relations
        agg = jax.ops.segment_sum(msgs, seg, num_segments=shard_n * L)
        return jnp.concatenate(
            [V_block, agg.reshape(shard_n, L * V_block.shape[-1])], axis=-1
        )

    spec_nodes = P(axis, None)
    spec_edges = P(axis, None)
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_nodes, spec_edges, spec_edges, spec_edges, spec_edges, spec_edges),
        out_specs=spec_nodes,
    )(V, graph.senders, graph.receivers, graph.relations, graph.weights, graph.mask)
