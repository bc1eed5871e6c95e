"""Multi-relational graph convolution aggregation — the framework's core op.

Semantics match the reference GraphConv (reference:
gnn/models/networks/robust_gcn.py:32-72): the adjacency ``A`` of shape
``(B, N, L, N)`` (node, relation, neighbor — the dataset layout produced by
the heuristic graph builder) is extended with an identity "self" relation 0,
each relation aggregates neighbor features, and the ``(L+1)`` relation
outputs are concatenated feature-wise before a single dense projection.

TPU-first formulation: instead of materializing the reference's preprocessed
``(B, (L+1)·N, N)`` operand (which contains a full dense identity block), the
self-relation is applied as an elementwise scale of ``V`` and the neighbor
relations as one batched ``(N·L, N) x (N, F)`` matmul — XLA maps it straight
onto the MXU with no wasted identity FLOPs. DropEdge keeps exact reference
semantics (iid dropout over the *preprocessed* operand, self-loops included
— reference: gnn/models/networks/drop_robust_gcn.py:69,76) by sampling the
``(B, N, L+1, N)`` mask and splitting it into a neighbor mask and a
self-loop diagonal scale.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def relational_aggregate(
    V: jnp.ndarray,
    A: jnp.ndarray,
    self_scale: Optional[jnp.ndarray] = None,
    *,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """Aggregate neighbor features per relation and prepend the self term.

    Args:
        V: node features ``(B, N, F)``.
        A: relational adjacency ``(B, N, L, N)``; ``A[b, n, l, m]`` is the
            weight of the edge ``m -> n`` under relation ``l``.
        self_scale: optional ``(B, N)`` per-node scale for the self term
            (DropEdge's effect on the identity relation). ``None`` = 1.

    Returns:
        ``(B, N, (L+1)*F)`` with layout ``[self | rel_0 | ... | rel_{L-1}]``
        per node, matching the reference's ``view(-1, N, (L+1)*F)`` layout
        (reference: gnn/models/networks/robust_gcn.py:45-47).
    """
    B, N, L, _ = A.shape
    F = V.shape[-1]
    neigh = relational_neighbor_aggregate(V, A, precision=precision)
    self_term = V if self_scale is None else V * self_scale[..., None]
    out = jnp.concatenate(
        [self_term[:, :, None, :], neigh.reshape(B, N, L, F)], axis=2
    )
    return out.reshape(B, N, (L + 1) * F)


def relational_neighbor_aggregate(
    V: jnp.ndarray,
    A: jnp.ndarray,
    *,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """Neighbor-only aggregation ``(B, N, L*F)`` — no self term, no concat.

    The production GraphConv uses this split form (self term handled as a
    separate small matmul) so the ``(B, N, (L+1)*F)`` concatenation copy
    never hits HBM; :func:`relational_aggregate` keeps the reference's
    concatenated layout for parity tests.
    """
    B, N, L, _ = A.shape
    F = V.shape[-1]
    # (B, N, L, N) x (B, N, F) -> (B, N*L, F): one batched MXU matmul.
    return jax.lax.dot_general(
        A.reshape(B, N * L, N),
        V,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=precision,
    ).reshape(B, N, L * F)


def preprocess_adjacency(A: jnp.ndarray) -> jnp.ndarray:
    """Materialize the reference's preprocessed operand ``(B, (L+1)N, N)``.

    Only used by parity tests and by the dense "efficient_mode"-faithful
    path; the production path never builds the identity block
    (see :func:`relational_aggregate`).
    Reference: gnn/models/networks/robust_gcn.py:53-72.
    """
    B, N, L, _ = A.shape
    eye = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype)[None, :, None, :], (B, N, 1, N))
    stacked = jnp.concatenate([eye, A], axis=2)  # (B, N, L+1, N)
    return stacked.reshape(B, (L + 1) * N, N)


def drop_edge(
    key: jax.Array,
    A: jnp.ndarray,
    rate: float,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """DropEdge with exact ``nn.Dropout(p)`` semantics on the preprocessed A.

    The reference applies ``nn.Dropout(p=0.3)`` to the already-preprocessed
    ``(B, (L+1)N, N)`` adjacency each layer, so self-loops are dropped too
    and survivors are scaled by ``1/(1-p)`` (reference:
    gnn/models/networks/drop_robust_gcn.py:38,69,76). Here the iid mask is
    drawn over the logical ``(B, N, L+1, N)`` tensor; relation 0's diagonal
    becomes the returned ``self_scale``.

    Returns:
        ``(A_dropped, self_scale)`` — feed both to
        :func:`relational_aggregate`.
    """
    if deterministic or rate <= 0.0:
        return A, None
    B, N, L, _ = A.shape
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=(B, N, L + 1, N))
    scale = 1.0 / keep
    A_dropped = A * (mask[:, :, 1:, :].astype(A.dtype) * scale)
    diag = jnp.diagonal(mask[:, :, 0, :], axis1=1, axis2=2)  # (B, N)
    self_scale = diag.astype(A.dtype) * scale
    return A_dropped, self_scale


def relational_aggregate_dense(
    V: jnp.ndarray,
    A_pre: jnp.ndarray,
    *,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """Reference-layout aggregation over a preprocessed ``(B, (L+1)N, N)`` A.

    Kept for numerics parity tests against the PyTorch reference
    (reference: gnn/models/networks/robust_gcn.py:45-47).
    """
    B, N, F = V.shape
    out = jnp.matmul(A_pre, V, precision=precision)  # (B, (L+1)N, F)
    L1 = A_pre.shape[1] // N
    return out.reshape(B, N, L1 * F)
