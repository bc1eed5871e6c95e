"""Sparse-kernel selection: plan a static graph onto the fastest TPU path.

The framework has three sparse relational-aggregation implementations
(reference math for all of them: gnn/models/networks/robust_gcn.py:45-47
and the DropEdge variant drop_robust_gcn.py:76-85):

* ``xla``        — gather + segment-sum (:func:`grl_tpu.ops.sparse.
  relational_neighbor_coo`). Scatter-add backward; the TPU serializes
  scatter on duplicate indices, so this is the correctness baseline,
  not the fast path.
* ``pallas_csr`` — the blocked-CSR Pallas kernel
  (:class:`grl_tpu.ops.pallas.csr_spmm.CSRGraphKernel`). Walks edges on
  the scalar core; measured no faster than ``xla`` at arxiv scale.
* ``ell``        — dual degree-bucketed ELL gather tables
  (:class:`grl_tpu.ops.ell.ELLGraphKernel`): both the forward and the
  backward are planned as (gather -> weighted reduce) chains with **no
  scatter in either direction** — the layout the TPU's gather emitter
  streams at memory speed. This is the default.

All three share the ``neighbor_aggregate(V, seed, rate)`` surface with
DropEdge fused via the stateless per-edge hash, so selection is a pure
config knob (``kernel_impl``).
"""
from __future__ import annotations

from typing import Union

import numpy as np

from grl_tpu.ops.ell import ELLGraphKernel
from grl_tpu.ops.pallas.csr_spmm import CSRAdjacency, CSRGraphKernel
from grl_tpu.ops.sparse import RelationalGraph
from grl_tpu.ops.tile import TileGraphKernel

# kernel_impl values accepted on the sparse path. "pallas" is the generic
# config value ("use the TPU kernels"); on sparse graphs it resolves to
# the fastest sparse implementation.
SPARSE_KERNELS = {
    "ell": ELLGraphKernel,
    "pallas": ELLGraphKernel,
    "pallas_csr": CSRGraphKernel,
    # Tile-dense hybrid: MXU tiles over locally dense blocks (after LPA
    # community reordering), ELL residual elsewhere (grl_tpu/ops/tile.py).
    "tile": TileGraphKernel,
}

KernelAdjacency = CSRAdjacency  # generic alias: carries ANY planned kernel


def attach_kernel(
    graph: RelationalGraph,
    impl: str = "ell",
    feature_dim: int = 256,
    attention: bool = False,
    **plan_kwargs,
) -> Union[RelationalGraph, KernelAdjacency]:
    """Plan a sparse kernel for a static graph (host-side, once).

    Returns a :class:`KernelAdjacency` — a RelationalGraph that also
    carries the planned kernel, which GraphConv routes aggregation
    through. ``impl="xla"`` returns the graph unchanged (segment-sum
    path). ``feature_dim`` should be the largest width the model
    aggregates at (used by the CSR VMEM budgeter; ignored by ELL).
    ``attention=True`` additionally plans the fused sparse-attention
    kernel (SDDMM+softmax+SpMM) over the same edge set, which
    SparseNodeSelfAtten then routes through.
    """
    if impl == "xla" and not attention:
        return graph
    if impl == "xla":
        kernel = None
    elif impl not in SPARSE_KERNELS:
        raise ValueError(
            f"Unknown sparse kernel_impl {impl!r}; "
            f"expected one of: xla, {', '.join(sorted(SPARSE_KERNELS))}"
        )
    else:
        cls = SPARSE_KERNELS[impl]
        kernel = cls(
            np.asarray(graph.senders),
            np.asarray(graph.receivers),
            np.asarray(graph.relations),
            np.asarray(graph.weights * graph.mask.astype(graph.weights.dtype)),
            num_nodes=graph.num_nodes,
            num_relations=graph.num_relations,
            feature_dim=feature_dim,
            **plan_kwargs,
        )
    senders, receivers = graph.senders, graph.receivers
    node_perm = getattr(kernel, "node_perm", None)
    if node_perm is not None:
        # The kernel reordered the node space at plan time (TileGraph
        # community packing): relabel the carried edge arrays so every
        # consumer of the adjacency (sparse attention, the XLA fallback)
        # lives in the SAME permuted space the caller must place
        # features/labels into (see FullGraphProcedure).
        import jax.numpy as jnp

        perm_j = jnp.asarray(node_perm.astype(np.int32))
        senders = perm_j[graph.senders]
        receivers = perm_j[graph.receivers]
    atten_kernel = None
    if attention:
        # Planned AFTER the aggregation kernel so the attention tables
        # live in the (possibly reordered) node space too.
        from grl_tpu.ops.pallas.sparse_attention import SparseAttentionKernel

        mask = np.asarray(graph.mask)
        atten_kernel = SparseAttentionKernel(
            np.asarray(senders)[mask],
            np.asarray(receivers)[mask],
            num_nodes=graph.num_nodes,
        )
    return KernelAdjacency(
        senders=senders,
        receivers=receivers,
        relations=graph.relations,
        weights=graph.weights,
        mask=graph.mask,
        num_nodes=graph.num_nodes,
        num_relations=graph.num_relations,
        batch_shape=graph.batch_shape,
        kernel=kernel,
        atten_kernel=atten_kernel,
        # Table pytree rides the adjacency through jit boundaries as an
        # argument (ELL/tile kernels expose .tables; CSR keeps closure
        # capture) — see CSRAdjacency.kernel_tables for why.
        kernel_tables=getattr(kernel, "tables", None),
    )
