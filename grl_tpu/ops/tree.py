"""Positional-tree aggregation: the sampled-minibatch fast path.

The neighbor sampler's minibatches are positional sampling trees
(grl_tpu/data/neighbor_sampler.py): level k+1 holds exactly
``fanouts[k]`` child slots per level-k parent, in CONTIGUOUS positions.
The edge ENDPOINTS are therefore identical for every batch — only the
per-edge weights/relations change — so the relational aggregation
(reference math: gnn/models/networks/robust_gcn.py:45-47) needs neither
gathers nor scatters: each level is a reshape of the child span to
``(parents, fanout, F)`` and a weighted (one-hot-relation) reduction —
pure VPU/MXU work on contiguous memory. The COO path for the same batch
pays ~E segment-sum scatter-adds, which the TPU serializes.

``TreeGraph`` rides the same GraphConv/EdgeDropout dispatch as
:class:`grl_tpu.ops.sparse.RelationalGraph` (it is a member of
``SparseAdjacency``), and DropEdge applies to it through the generic
``drop_edge_coo`` with identical iid-keep/rescale semantics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


class TreeGraph(flax.struct.PyTreeNode):
    """Group-stacked positional sampling-tree adjacency.

    ``weights``/``relations`` are ``(G, E)`` with edges in the sampler's
    level-major order (level-k edges contiguous, child-slot order);
    masked/padding edges carry weight 0. The endpoints are implied by
    the static tree geometry.
    """

    weights: jnp.ndarray  # (G, E) float
    relations: jnp.ndarray  # (G, E) int32
    level_sizes: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    fanouts: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    num_relations: int = flax.struct.field(pytree_node=False)

    @property
    def groups(self) -> int:
        return self.weights.shape[0]

    @property
    def nodes_per_group(self) -> int:
        return int(sum(self.level_sizes))

    @property
    def num_nodes(self) -> int:  # duck-types RelationalGraph (DropEdge)
        return self.groups * self.nodes_per_group

    @property
    def batch_shape(self) -> Tuple[int, int]:
        return (self.groups, self.nodes_per_group)


def tree_neighbor_aggregate(
    V: jnp.ndarray,
    tree: TreeGraph,
    edge_keep: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Neighbor-only aggregation ``(G*maxN, L*F)`` — the scatter-free
    equivalent of :func:`grl_tpu.ops.sparse.relational_neighbor_coo` on
    the tree's implied COO edges (same output layout, so the same
    GraphConv weights apply)."""
    G = tree.groups
    maxN = tree.nodes_per_group
    L = tree.num_relations
    F = V.shape[-1]
    Vg = V.reshape(G, maxN, F)
    w_all = tree.weights
    if edge_keep is not None:
        w_all = w_all * edge_keep.reshape(w_all.shape)
    w_all = w_all.astype(V.dtype)

    outs = []
    lo_child = tree.level_sizes[0]
    e_off = 0
    for k, f in enumerate(tree.fanouts):
        n_k = tree.level_sizes[k]
        child = Vg[:, lo_child:lo_child + n_k * f, :].reshape(G, n_k, f, F)
        w = w_all[:, e_off:e_off + n_k * f].reshape(G, n_k, f)
        rel = tree.relations[:, e_off:e_off + n_k * f].reshape(G, n_k, f)
        if L == 1:
            out_k = jnp.einsum("gnf,gnfd->gnd", w, child)[:, :, None, :]
        else:
            onehot = jax.nn.one_hot(rel, L, dtype=V.dtype)
            out_k = jnp.einsum("gnf,gnfl,gnfd->gnld", w, onehot, child)
        outs.append(out_k.reshape(G, n_k, L * F))
        lo_child += n_k * f
        e_off += n_k * f
    # Leaf level: no sampled children -> zero neighbor term (identical to
    # the COO path, whose leaf slots receive no edges).
    outs.append(jnp.zeros((G, tree.level_sizes[-1], L * F), V.dtype))
    return jnp.concatenate(outs, axis=1).reshape(G * maxN, L * F)
