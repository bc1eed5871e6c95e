"""Scatter-free sparse relational aggregation in ELL (padded neighbor
list) form — the TPU-native answer to the reference's sparse aggregation
(reference math: gnn/models/networks/robust_gcn.py:45-47 and its DropEdge
variant drop_robust_gcn.py:76-85).

Why ELL beats both scatter-based sparse paths on TPU
----------------------------------------------------
``segment_sum`` (and the backward of ``jnp.take``) lowers to an XLA
scatter-add, which the TPU backend serializes on duplicate indices — the
measured arxiv-scale fwd+bwd sits at ~2% of the HBM roofline.  The TPU's
*gather* emitter, by contrast, streams full 128-lane rows near memory
speed.  So we plan BOTH directions of the op as gathers at graph-build
time (the graph is static — the framework's bucketed-static-shape
contract):

* **forward**: for every output row ``r = node*L + rel`` a padded list of
  sender rows into ``V`` — ``out[r] = sum_k w[r,k] * V[idx[r,k]]``;
* **backward**: for every *sender* node a padded list of output rows into
  the cotangent ``g`` — ``dV[s] = sum_k w'[s,k] * g[idx'[s,k]]``.

Neither direction contains a scatter; both are (gather → weighted
reduce) chains XLA fuses into a single streamed pass.  Rows are bucketed
by degree (widths grow geometrically from ``width_quantum``) so hub nodes
do not inflate the padding of the long tail; bucket results are stitched
with one inverse-permutation gather.

**DropEdge fuses for free**: each table entry carries its global edge id,
and the keep/rescale mask is a stateless murmur-style hash of
``(edge id, seed)`` (:func:`grl_tpu.ops.pallas.csr_spmm._hash_keep`) —
recomputed identically in the forward and backward walks, so no mask
tensor is ever materialized in HBM.

Padding entries carry ``w == 0`` and gather row 0, so they are inert
without a sacrificial feature row.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from grl_tpu.ops.pallas.csr_spmm import _hash_keep


class _Bucket(NamedTuple):
    idx: jnp.ndarray  # (rows, W) int32 — gather rows
    weight: jnp.ndarray  # (rows, W) float32 — 0 for padding entries
    gid: jnp.ndarray  # (rows, W) int32 — global edge ids (DropEdge hash)


class TablePlan(NamedTuple):
    """One planned gather direction (see :func:`_build_tables`)."""

    buckets: List[_Bucket]
    inv_perm: jnp.ndarray  # bucket-concatenated row -> out_row order
    perm: np.ndarray  # out_row ids in bucket-concatenated order
    edge_flat: np.ndarray  # per input edge: its flat cell index in the
    #                        raveled concatenation of all bucket tables
    #                        (sparse attention addresses per-edge values —
    #                        scores/alphas — through this)


def _build_tables(
    out_row: np.ndarray,
    src_row: np.ndarray,
    weights: np.ndarray,
    gids: np.ndarray,
    num_out_rows: int,
    width_quantum: int,
    bucket_growth: int,
) -> TablePlan:
    """Plan one gather direction: per-out-row padded lists, degree-bucketed.

    Returns the buckets (rows sorted by degree bucket), the inverse
    permutation mapping bucket-concatenated rows back to ``out_row`` order,
    the forward permutation, and each input edge's flat table cell index.
    Zero-degree rows land in the narrowest bucket as all-padding rows.
    """
    order = np.argsort(out_row, kind="stable")
    out_s, src_s, w_s, g_s = (
        out_row[order], src_row[order], weights[order], gids[order])
    counts = np.bincount(out_s, minlength=num_out_rows)
    starts = np.concatenate([[0], np.cumsum(counts)])

    max_deg = int(counts.max()) if len(counts) else 0
    widths = [width_quantum]
    while widths[-1] < max(max_deg, 1):
        # bucket_growth=1 selects ARITHMETIC widths (q, 2q, 3q, ...):
        # ~2x less slot padding than geometric on Poisson-degree graphs
        # (measured ~36% -> ~8% at avg degree 7) at the cost of more,
        # smaller bucket programs.
        widths.append(
            widths[-1] * bucket_growth
            if bucket_growth > 1
            else widths[-1] + width_quantum
        )
    bucket_of = np.searchsorted(np.asarray(widths), counts)

    # Fully vectorized table fill (a per-row Python loop here cost ~200s
    # at ogbn-arxiv scale): every edge lands at table cell
    # (rank of its out-row within its bucket, position within its row).
    slot = np.arange(len(out_s), dtype=np.int64) - starts[out_s]
    rows_by_bucket = np.argsort(bucket_of, kind="stable")  # row ids
    bucket_counts = np.bincount(bucket_of, minlength=len(widths))
    bucket_starts = np.concatenate([[0], np.cumsum(bucket_counts)])
    rank_in_bucket = np.empty(num_out_rows, np.int64)
    rank_in_bucket[rows_by_bucket] = (
        np.arange(num_out_rows) - bucket_starts[bucket_of[rows_by_bucket]]
    )
    edge_bucket = bucket_of[out_s]

    buckets: List[_Bucket] = []
    perm_parts = []
    ravel_offset = np.zeros(len(widths), np.int64)
    off = 0
    for bi, W in enumerate(widths):
        n_rows = int(bucket_counts[bi])
        if n_rows == 0 and bi > 0:
            continue
        ravel_offset[bi] = off
        off += n_rows * W
        idx = np.zeros((n_rows, W), np.int32)
        wgt = np.zeros((n_rows, W), np.float32)
        gid = np.zeros((n_rows, W), np.int32)
        sel = edge_bucket == bi
        jj = rank_in_bucket[out_s[sel]]
        kk = slot[sel]
        idx[jj, kk] = src_s[sel]
        wgt[jj, kk] = w_s[sel]
        gid[jj, kk] = g_s[sel]
        buckets.append(_Bucket(jnp.asarray(idx), jnp.asarray(wgt),
                               jnp.asarray(gid)))
        perm_parts.append(
            rows_by_bucket[bucket_starts[bi]:bucket_starts[bi] + n_rows]
        )
    perm = np.concatenate(perm_parts) if perm_parts else np.zeros(0, np.int64)
    inv_perm = np.argsort(perm)
    widths_arr = np.asarray(widths, np.int64)
    flat_sorted = (
        ravel_offset[edge_bucket]
        + rank_in_bucket[out_s] * widths_arr[edge_bucket]
        + slot
    )
    edge_flat = np.empty(len(out_s), np.int64)
    edge_flat[order] = flat_sorted
    return TablePlan(
        buckets, jnp.asarray(inv_perm.astype(np.int32)), perm, edge_flat
    )


def _gather_reduce(Vp, bucket: _Bucket, seed, rate: float) -> jnp.ndarray:
    """(rows, F) = sum_k w[.,k] (*mask) * Vp[idx[.,k]] — f32 accumulate.

    Unrolled as W separate (gather -> fma) terms instead of one
    ``einsum("rw,rwf->rf")``: XLA fuses each row-gather into the
    elementwise multiply-add chain, so the ``(rows, W, F)`` gathered
    tensor never materializes in HBM (measured ~25% faster at W=8 and
    strictly less HBM pressure). The op stays gather-TRANSACTION-bound
    either way — see docs/model-performance.md for the measured
    ~0.3-0.4 B rows/s gather ceiling that sets this kernel's roofline.
    """
    w = bucket.weight
    if rate > 0.0:
        w = w * _hash_keep(bucket.gid, seed, rate)
    W = bucket.idx.shape[1]
    if W > 32:
        # Hub buckets (few rows, wide): the einsum form keeps the compiled
        # program small; the (rows, W, F) intermediate is tiny here.
        msg = jnp.take(Vp, bucket.idx, axis=0).astype(jnp.float32)
        return jnp.einsum("rw,rwf->rf", w, msg)
    out = None
    for k in range(W):
        term = (
            jnp.take(Vp, bucket.idx[:, k], axis=0).astype(jnp.float32)
            * w[:, k : k + 1]
        )
        out = term if out is None else out + term
    return out


class ELLProjTables(NamedTuple):
    """Projected-aggregation tables (see ``plan_projected``): forward
    gathers RELATION-CHANNELED rows ``sender·L + rel`` of a pre-projected
    ``(N·L, C)`` feature array into N receiver rows (relations SUM, so
    the out-row space is N, not N·L); backward gathers the ``(N, C)``
    cotangent into N·L projected-input rows."""

    fwd: tuple
    fwd_inv: jnp.ndarray
    bwd: tuple
    bwd_inv: jnp.ndarray


class ELLTables(NamedTuple):
    """The kernel's device-array tables as ONE pytree.

    Passed through jit boundaries as an ARGUMENT (see
    ``KernelAdjacency.kernel_tables``): a closure-captured device array
    is embedded in the lowered program as a constant, which through the
    TPU tunnel is (a) re-uploaded with every compile (~10 s per 100 MB)
    and (b) hard-capped by the compile service's HTTP request limit —
    table-heavy kernels (tile hybrid: 100s of MB) exceed it outright.
    As parameters they cost nothing at compile time.
    """

    fwd: tuple  # Tuple[_Bucket, ...]
    fwd_inv: jnp.ndarray
    bwd: tuple  # Tuple[_Bucket, ...]
    bwd_inv: jnp.ndarray
    proj: object = None  # Optional[ELLProjTables]


def zero_cotangent(tree):
    """Cotangents for a non-differentiable table pytree: float0 for
    integer/bool leaves (no storage), zeros for float leaves (DCE'd —
    nothing consumes them)."""
    def zero(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), jax.dtypes.float0)

    return jax.tree.map(zero, tree)


def _trivial_inv(plan) -> bool:
    """True when the bucket-concatenated rows are already in natural
    order (degree-sorted node space) and the stitch gather can be
    skipped — it would be an identity costing one row-gather per out
    row (~0.5 ms/pass at arxiv scale)."""
    return bool(np.array_equal(plan.perm, np.arange(len(plan.perm))))


def _ell_fwd_only(tables, V, seed, num_nodes, L, rate):
    parts = [_gather_reduce(V, b, seed, rate) for b in tables.fwd]
    out = jnp.concatenate(parts, axis=0)
    if tables.fwd_inv is not None:
        out = jnp.take(out, tables.fwd_inv, axis=0)
    return out.reshape(num_nodes, L * V.shape[-1]).astype(V.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ell_aggregate(tables, V, seed, num_nodes, L, rate):
    """Dual-ELL neighbor aggregation as a pure function of the table
    pytree (differentiable w.r.t. ``V`` only)."""
    return _ell_fwd_only(tables, V, seed, num_nodes, L, rate)


def _ell_fwd(tables, V, seed, num_nodes, L, rate):
    return _ell_fwd_only(tables, V, seed, num_nodes, L, rate), (
        tables, V, seed,
    )


def _ell_bwd(num_nodes, L, rate, residuals, g):
    tables, V, seed = residuals
    F = V.shape[-1]
    g2 = g.reshape(num_nodes * L, F)
    parts = [_gather_reduce(g2, b, seed, rate) for b in tables.bwd]
    dV = jnp.concatenate(parts, axis=0)
    if tables.bwd_inv is not None:
        dV = jnp.take(dV, tables.bwd_inv, axis=0)
    dV = dV.astype(V.dtype)
    if V.shape[0] > num_nodes:
        dV = jnp.pad(dV, ((0, V.shape[0] - num_nodes), (0, 0)))
    d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return zero_cotangent(tables), dV, d_seed


ell_aggregate.defvjp(_ell_fwd, _ell_bwd)


def _ell_proj_fwd_only(proj, Vr, seed, num_nodes, rate):
    parts = [_gather_reduce(Vr, b, seed, rate) for b in proj.fwd]
    out = jnp.concatenate(parts, axis=0)
    if proj.fwd_inv is not None:
        out = jnp.take(out, proj.fwd_inv, axis=0)
    return out.astype(Vr.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ell_aggregate_projected(tables, Vr, seed, num_nodes, L, rate):
    """PROJECT-FIRST neighbor aggregation: ``Vr (N·L, C)`` holds the
    per-relation projected features ``V @ W_r`` stacked relation-minor
    (row ``n·L + r``); returns the relation-SUMMED ``(N, C)``
    aggregation ``sum_r A_r @ (V W_r)`` — by matmul associativity the
    exact math of ``aggregate-then-project`` but gathered at the OUTPUT
    width.  When C < L·F_in (e.g. the flagship's 512-wide third conv
    projecting to 256) this halves the gather transactions, the op's
    binding resource (docs/model-performance.md roofline).  DropEdge
    hashes the same per-edge gids, so masks match the standard path
    exactly for a given seed.  Differentiable w.r.t. ``Vr``.
    """
    return _ell_proj_fwd_only(tables.proj, Vr, seed, num_nodes, rate)


def _ell_proj_vjp_fwd(tables, Vr, seed, num_nodes, L, rate):
    return (
        _ell_proj_fwd_only(tables.proj, Vr, seed, num_nodes, rate),
        (tables, Vr, seed),
    )


def _ell_proj_vjp_bwd(num_nodes, L, rate, residuals, g):
    tables, Vr, seed = residuals
    proj = tables.proj
    parts = [_gather_reduce(g, b, seed, rate) for b in proj.bwd]
    dVr = jnp.concatenate(parts, axis=0)
    if proj.bwd_inv is not None:
        dVr = jnp.take(dVr, proj.bwd_inv, axis=0)
    dVr = dVr.astype(Vr.dtype)
    if Vr.shape[0] > num_nodes * L:
        dVr = jnp.pad(dVr, ((0, Vr.shape[0] - num_nodes * L), (0, 0)))
    d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return zero_cotangent(tables), dVr, d_seed


ell_aggregate_projected.defvjp(_ell_proj_vjp_fwd, _ell_proj_vjp_bwd)


class ELLGraphKernel:
    """A static graph planned as dual degree-bucketed ELL gather tables.

    Drop-in for :class:`grl_tpu.ops.pallas.csr_spmm.CSRGraphKernel`
    (same ``neighbor_aggregate(V, seed, rate)`` surface, same fused
    stateless-hash DropEdge), built once per graph on the host.
    """

    def __init__(
        self,
        senders: np.ndarray,
        receivers: np.ndarray,
        relations: np.ndarray,
        weights: np.ndarray,
        num_nodes: int,
        num_relations: int,
        width_quantum: int = 4,
        bucket_growth: int = 2,
        plan_projected: bool = False,
        reorder: str = "none",
        **_ignored,  # planner kwargs shared with CSRGraphKernel
    ):
        senders = np.asarray(senders, np.int64)
        receivers = np.asarray(receivers, np.int64)
        relations = np.asarray(relations, np.int64)
        weights = np.asarray(weights, np.float32)
        keep = weights != 0.0  # drop padding / masked edges at plan time
        gids = np.arange(len(senders), dtype=np.int64)[keep]
        senders, receivers = senders[keep], receivers[keep]
        relations, weights = relations[keep], weights[keep]

        self.num_nodes = int(num_nodes)
        self.L = int(num_relations)
        R = self.num_nodes * self.L

        # reorder="degree": relabel nodes in in-degree-BUCKET order so
        # the forward tables' bucket-concatenated rows land in natural
        # order — the O(N) inverse-permutation stitch gather (one row
        # per out row, ~0.5 ms/pass at arxiv scale) becomes the identity
        # and is skipped entirely. Single-relation graphs only (L>1 out
        # rows interleave relations per node, which no node order can
        # bucket-sort). The caller must place features/labels through
        # node_perm, exactly as for the tile kernel's LPA order
        # (attach_kernel + FullGraphProcedure handle it).
        self.node_perm = None
        if reorder == "degree" and self.L == 1 and len(senders):
            counts = np.bincount(receivers, minlength=self.num_nodes)
            max_deg = int(counts.max())
            widths = [width_quantum]
            while widths[-1] < max(max_deg, 1):
                widths.append(
                    widths[-1] * bucket_growth
                    if bucket_growth > 1
                    else widths[-1] + width_quantum
                )
            bucket_of = np.searchsorted(np.asarray(widths), counts)
            order = np.argsort(bucket_of, kind="stable")
            perm = np.empty(self.num_nodes, np.int64)
            perm[order] = np.arange(self.num_nodes)
            self.node_perm = perm
            senders = perm[senders]
            receivers = perm[receivers]
        elif reorder not in ("none", None, "degree"):
            raise ValueError(f"unknown reorder {reorder!r} for ELL")

        # forward: out row (node*L + rel) gathers sender rows of V.
        fwd_plan = _build_tables(
            out_row=(receivers * self.L + relations).astype(np.int64),
            src_row=senders, weights=weights, gids=gids,
            num_out_rows=R, width_quantum=width_quantum,
            bucket_growth=bucket_growth,
        )
        self._fwd, self._fwd_inv = fwd_plan.buckets, fwd_plan.inv_perm
        # backward: sender row gathers cotangent rows (node*L + rel).
        bwd_plan = _build_tables(
            out_row=senders,
            src_row=(receivers * self.L + relations).astype(np.int64),
            weights=weights, gids=gids,
            num_out_rows=self.num_nodes, width_quantum=width_quantum,
            bucket_growth=bucket_growth,
        )
        self._bwd, self._bwd_inv = bwd_plan.buckets, bwd_plan.inv_perm
        proj = None
        if plan_projected:
            # Project-first tables (ell_aggregate_projected): forward
            # gathers relation-channeled rows sender·L+rel of the
            # pre-projected (N·L, C) array, SUMMING relations into N out
            # rows; backward gathers the (N, C) cotangent by receiver.
            pf = _build_tables(
                out_row=receivers, src_row=(senders * self.L + relations),
                weights=weights, gids=gids, num_out_rows=self.num_nodes,
                width_quantum=width_quantum, bucket_growth=bucket_growth,
            )
            pb = _build_tables(
                out_row=(senders * self.L + relations), src_row=receivers,
                weights=weights, gids=gids, num_out_rows=R,
                width_quantum=width_quantum, bucket_growth=bucket_growth,
            )
            proj = ELLProjTables(
                fwd=tuple(pf.buckets),
                fwd_inv=None if _trivial_inv(pf) else pf.inv_perm,
                bwd=tuple(pb.buckets),
                bwd_inv=None if _trivial_inv(pb) else pb.inv_perm,
            )
        self.tables = ELLTables(
            fwd=tuple(self._fwd),
            fwd_inv=None if _trivial_inv(fwd_plan) else self._fwd_inv,
            bwd=tuple(self._bwd),
            bwd_inv=None if _trivial_inv(bwd_plan) else self._bwd_inv,
            proj=proj,
        )

    def pad_features(self, V: jnp.ndarray) -> jnp.ndarray:
        return V  # padding entries gather row 0 with weight 0 — inert

    def neighbor_aggregate(
        self, V: jnp.ndarray, seed=0, rate: float = 0.0, tables=None
    ) -> jnp.ndarray:
        """``(num_nodes, L*F)`` neighbor aggregation, optionally DropEdge'd
        with the fused per-edge hash mask. Differentiable w.r.t. ``V``;
        ``seed`` may be traced, ``rate`` must be static.

        ``tables``: the :class:`ELLTables` pytree, passed explicitly when
        the caller threads it through a jit boundary as an argument
        (GraphConv does, via ``KernelAdjacency.kernel_tables``); defaults
        to the kernel's own — which inside a jit becomes an embedded
        program constant, fine on CPU tests, slow through the tunnel.
        """
        return ell_aggregate(
            tables if tables is not None else self.tables,
            V, jnp.asarray(seed), self.num_nodes, self.L, float(rate),
        )

    def neighbor_aggregate_projected(
        self, Vr: jnp.ndarray, seed=0, rate: float = 0.0, tables=None
    ) -> jnp.ndarray:
        """Project-first aggregation: ``Vr (num_nodes·L, C)`` (row
        ``n·L + r`` = ``V[n] @ W_r``) -> relation-summed ``(num_nodes,
        C)``.  Requires ``plan_projected=True`` at construction.  See
        :func:`ell_aggregate_projected`."""
        tbl = tables if tables is not None else self.tables
        if tbl.proj is None:
            raise ValueError(
                "kernel planned without plan_projected=True; no "
                "projected tables available"
            )
        return ell_aggregate_projected(
            tbl, Vr, jnp.asarray(seed), self.num_nodes, self.L, float(rate)
        )
