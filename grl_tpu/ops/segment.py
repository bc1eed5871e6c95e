"""Segment reductions for sparse message passing.

These are the scatter/gather primitives the reference gets implicitly from
PyTorch CUDA kernels (reference: gnn/models/networks/dgcnn.py:19-64 uses
topk/gather; the SpMM in robust_gcn.py:45 is dense). Here they are explicit
static-shape ops built on ``jax.ops.segment_sum`` so XLA can fuse them, and
they back the COO aggregation path in :mod:`grl_tpu.ops.sparse`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
) -> jnp.ndarray:
    """Static-shape segment sum (thin wrapper, kept as a stable surface)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
) -> jnp.ndarray:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Numerically-stable softmax over edges grouped by receiver node.

    Used by the sparse attention path (GAT-family) instead of the
    reference's dense ``N x N`` masked softmax
    (reference: gnn/models/networks/gatv2.py:238-247).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    seg_max = segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return exp / denom[segment_ids]
