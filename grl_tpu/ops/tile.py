"""Tile-dense hybrid sparse relational aggregation — MXU tiles + ELL
residual (reference math: gnn/models/networks/robust_gcn.py:45-47 and the
DropEdge variant drop_robust_gcn.py:76-85).

Why a hybrid
------------
The per-edge gather path (:class:`grl_tpu.ops.ell.ELLGraphKernel`) is
bound by the TPU gather emitter's transaction rate (~0.3 B rows/s,
locality- and dtype-insensitive — measured in scripts/probe_gather.py),
i.e. ~2 transactions per edge fwd+bwd, full stop.  The only lever left
is the TRANSACTION COUNT PER EDGE: where the graph has locally dense
structure, a B x B block of the adjacency with k edges can be stored as
one dense tile and applied as a single MXU batched-matmul against a
B-row feature block — k edges for ~2 block reads and 2·B²·F MACs
instead of k row-gather transactions.  A tile pays off above a density
threshold (cost model in :func:`default_min_edges`); everything below
threshold stays on the ELL tables.  On graphs with no exploitable block
structure zero tiles are selected and the kernel degrades to exactly
ELL.

Making tiles exist at all is the node ORDER's job: community-clustered
graphs scattered over random ids have uniformly sparse blocks, so the
planner first applies a label-propagation ordering
(:func:`grl_tpu.ops.reorder.lpa_order`) that packs each community into
contiguous rows.  The permutation is pure plan-time metadata: the kernel
relabels its edges and exposes ``node_perm``; the procedure scatters
features/labels through it ONCE at setup (grl_tpu/trainer/procedures/
full_graph_procedure.py), so the training loop pays zero per-step
permutation cost and outputs stay consistent with the permuted labels.

Layout
------
Per relation and direction, block-rows are bucketed by tile count
(geometric widths, like the ELL row buckets) and each bucket stores its
tiles INLINE in K-concat form — ``(rows, B, W·B)``, the row's W tiles
side by side along the contraction axis — so the whole bucket is ONE
batched matmul with K = W·B (deep contractions amortize MXU weight
loads; measured 3.3x the small-K rate) and there is no tile
indirection; the only gather is of whole ``(B, F)`` feature blocks.
The backward direction has its own tables with the tiles
pre-transposed, so neither direction contains a scatter.

DropEdge fuses without any stored mask or edge-id table: the keep mask
is a stateless PRF of ``(receiver, sender, relation, seed)``
(:func:`_hash_keep_pair`), and both endpoints are reconstructible from
any table cell's coordinates in either direction — so the forward and
backward walks recompute identical masks, the invariant the ELL kernel
needs a stored gid table for.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from grl_tpu.ops.ell import ELLGraphKernel, ELLTables, zero_cotangent
from grl_tpu.ops.pallas.csr_spmm import _mix32


def _hash_keep_pair(recv, send, seed, rate):
    """Stateless keep/rescale mask keyed on BOTH edge endpoints.

    Same PRF design notes as :func:`grl_tpu.ops.pallas.csr_spmm.
    _hash_keep` (the seed enters through two different group operations
    so masks across seeds are not translates of one fixed set); here the
    key is the (receiver, sender) pair so the mask is recomputable from
    a tile cell's coordinates in either the forward (recv-major) or
    backward (send-major) table layout.
    """
    s = seed.astype(jnp.uint32)
    x = _mix32(recv.astype(jnp.uint32) ^ s)
    x = _mix32(x + send.astype(jnp.uint32))
    x = _mix32(x + s)
    u = (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    keep = 1.0 - rate
    return (u < keep).astype(jnp.float32) / keep


def default_min_edges(tile_size: int, feature_dim: int = 128) -> int:
    """Edges per tile above which the dense tile beats per-edge gathers.

    MEASURED v5e constants (scanned, dispatch-amortized — round-5 TPU
    probes): the batched tile matmul at F=128 processes dense adjacency
    entries at ~30 B entries/s per direction (MXU efficiency on
    (rows, B, K)@(rows, K, F) shapes, K-concat layout), and an ELL edge
    costs ~4.7 ns per direction (gather transaction + table padding +
    stitch overheads at arxiv scale).  Equating per-direction costs
    gives ``k* = B² / (30e9 · 4.7e-9) ≈ B²/141``.  Clamped to ≥32 so
    pathological tiny tiles never win.
    """
    entries_per_s = 30e9  # measured dense-entry rate per direction
    ell_edge_ns = 4.7  # measured ELL per-edge per-direction cost
    tile_ns = tile_size * tile_size / entries_per_s * 1e9
    return max(32, int(np.ceil(tile_ns / ell_edge_ns)))


class _TileBucket(NamedTuple):
    # K-CONCAT layout: a row's W tiles are stored side by side along the
    # CONTRACTION axis — ``tiles[r, :, w*B:(w+1)*B]`` is tile w — so the
    # whole bucket applies as ONE batched matmul with K = W·B.  Measured
    # (v5e, dispatch-amortized): K=1024 runs ~3.3x the MXU rate of four
    # K=256 matmuls — deeper contraction amortizes MXU weight loads.
    tiles: jnp.ndarray  # (rows, B, W*B) — 0 for padding slots
    col: jnp.ndarray  # (rows, W) int32 — source block id; 0 for padding
    out_block: jnp.ndarray  # (rows,) int32 — block-row id in the OTHER
    #                         (output) space; used to reconstruct the
    #                         absolute row/col ids the DropEdge PRF keys on


class _DirectionPlan(NamedTuple):
    buckets: tuple  # Tuple[_TileBucket, ...]
    inv_perm: jnp.ndarray  # (nb,) int32: concat(bucket rows) -> block order


class TileTables(NamedTuple):
    """All device-array tables as one pytree — passed through jit
    boundaries as an ARGUMENT via ``KernelAdjacency.kernel_tables``
    (see :class:`grl_tpu.ops.ell.ELLTables` for why: closure-captured
    tables become program constants, which the TPU tunnel's compile
    service re-uploads per compile and hard-caps in size — the tile
    tables alone can run to hundreds of MB)."""

    fwd: tuple  # per-relation Optional[_DirectionPlan]
    bwd: tuple
    ell: object  # Optional[ELLTables] for the residual edges
    proj: object = None  # () when the projected mode is planned


def _rel_seed_mix(r: int) -> int:
    return (0x85EB0001 * (r + 1)) & 0xFFFFFFFF


def _build_tile_tables(
    out_blk: np.ndarray,
    src_blk: np.ndarray,
    out_loc: np.ndarray,
    src_loc: np.ndarray,
    weights: np.ndarray,
    nb: int,
    B: int,
    dense_key_set: np.ndarray,
    dtype: str = "float32",
) -> _DirectionPlan:
    """One direction's bucketed inline-tile tables.

    ``out_blk/src_blk``: per covered edge, output and source block ids;
    ``out_loc/src_loc``: within-block coordinates.  ``dense_key_set``:
    sorted unique ``out_blk * nb + src_blk`` keys of the selected tiles.
    Every block-row appears in some bucket (tile-less rows in the
    width-1 bucket as all-padding), mirroring the ELL planner.
    """
    T = len(dense_key_set)
    dI = (dense_key_set // nb).astype(np.int64)
    dJ = (dense_key_set % nb).astype(np.int64)
    tiles_per_row = np.bincount(dI, minlength=nb)
    max_t = int(tiles_per_row.max()) if T else 0
    widths = [1]
    while widths[-1] < max(max_t, 1):
        widths.append(widths[-1] * 2)
    bucket_of_row = np.searchsorted(np.asarray(widths), tiles_per_row)

    # slot of each tile within its row (tiles are sorted by (I, J))
    starts = np.concatenate([[0], np.cumsum(tiles_per_row)])
    slot = np.arange(T, dtype=np.int64) - starts[dI]

    rows_by_bucket = np.argsort(bucket_of_row, kind="stable")
    bucket_counts = np.bincount(bucket_of_row, minlength=len(widths))
    bucket_starts = np.concatenate([[0], np.cumsum(bucket_counts)])
    rank_in_bucket = np.empty(nb, np.int64)
    rank_in_bucket[rows_by_bucket] = (
        np.arange(nb) - bucket_starts[bucket_of_row[rows_by_bucket]]
    )

    # map each covered edge to its tile id
    key = out_blk * nb + src_blk
    tile_id = np.searchsorted(dense_key_set, key)
    e_bucket = bucket_of_row[dI[tile_id]]

    buckets: List[_TileBucket] = []
    perm_parts = []
    for bi, W in enumerate(widths):
        n_rows = int(bucket_counts[bi])
        if n_rows == 0 and bi > 0:
            continue
        tiles = np.zeros((n_rows, B, W * B), np.float32)
        col = np.zeros((n_rows, W), np.int32)
        rows_here = rows_by_bucket[
            bucket_starts[bi]: bucket_starts[bi] + n_rows
        ]
        # place tile metadata
        tsel = bucket_of_row[dI] == bi
        col[rank_in_bucket[dI[tsel]], slot[tsel]] = dJ[tsel].astype(np.int32)
        # place edges (K-concat: slot w occupies columns w*B..(w+1)*B)
        esel = e_bucket == bi
        t_e = tile_id[esel]
        np.add.at(
            tiles,
            (
                rank_in_bucket[dI[t_e]],
                out_loc[esel],
                slot[t_e] * B + src_loc[esel],
            ),
            weights[esel],
        )
        buckets.append(
            _TileBucket(
                jnp.asarray(tiles).astype(dtype), jnp.asarray(col),
                jnp.asarray(rows_here.astype(np.int32)),
            )
        )
        perm_parts.append(rows_here)
    perm = np.concatenate(perm_parts)
    inv_perm = np.argsort(perm).astype(np.int32)
    return _DirectionPlan(tuple(buckets), jnp.asarray(inv_perm))


def _apply_tables(
    plan: _DirectionPlan,
    Xblk: jnp.ndarray,  # (nb, B, F) source blocks
    B: int,
    seed,
    rate: float,
    rel_seed_mix: int,
    transposed: bool,
) -> jnp.ndarray:
    """One batched K=W·B matmul per bucket (K-concat layout), stitched to
    block order: returns ``(nb, B, F)`` float32.

    ``transposed=False``: forward layout — tile cell (a, w·B+b) is edge
    (recv = out·B + a, send = col[w]·B + b).  ``transposed=True``:
    backward layout — cell (x, w·B+y) is edge (recv = col[w]·B + y,
    send = out·B + x).  The DropEdge PRF is keyed on the absolute
    (recv, send) pair, so both directions regenerate the SAME mask for
    the same edge.
    """
    F = Xblk.shape[-1]
    dt = Xblk.dtype
    use_mask = rate > 0.0
    if use_mask:
        seed_m = (
            jnp.asarray(seed).astype(jnp.uint32)
            ^ jnp.uint32(rel_seed_mix)
        )
    parts = []
    for bucket in plan.buckets:
        rows, W = bucket.col.shape
        # (rows, W, B, F) block gather -> (rows, W*B, F) stacked sources
        src = jnp.take(Xblk, bucket.col, axis=0).reshape(rows, W * B, F)
        tiles = bucket.tiles
        if use_mask:
            a_id = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
            within = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, W, B), 3
            ).reshape(1, 1, W * B)
            src_ids = (
                jnp.repeat(bucket.col, B, axis=1)[:, None, :] * B + within
            )  # (rows, 1, W*B): absolute id of each K column's node
            out_ids = bucket.out_block[:, None, None] * B + a_id
            if transposed:
                recv, send = src_ids, out_ids
            else:
                recv, send = out_ids, src_ids
            tiles = tiles * _hash_keep_pair(recv, send, seed_m, rate)
        parts.append(
            jnp.einsum(
                "rak,rkf->raf",
                tiles.astype(dt),
                src.astype(dt),
                preferred_element_type=jnp.float32,
            )
        )
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, plan.inv_perm, axis=0)


class TileGraphKernel:
    """Hybrid tile-dense + ELL sparse aggregation for one static graph.

    Drop-in for :class:`grl_tpu.ops.ell.ELLGraphKernel` (same
    ``neighbor_aggregate(V, seed, rate)`` surface, same fused stateless
    DropEdge), planned once on the host.

    Args beyond the shared kernel signature:
        tile_size: dense tile edge length ``B`` (multiple of 128 keeps
            the MXU happy; default 256).
        tile_min_edges: per-tile edge count above which a block goes
            dense (default: :func:`default_min_edges`).
        reorder: ``"lpa"`` (default) | ``"rcm"`` | ``"none"`` — plan-time
            node ordering that concentrates communities into blocks.
            When active, :attr:`node_perm` maps original node id -> new
            row, and the caller must feed features (and interpret
            outputs/labels) in the permuted space.
    """

    def __init__(
        self,
        senders: np.ndarray,
        receivers: np.ndarray,
        relations: np.ndarray,
        weights: np.ndarray,
        num_nodes: int,
        num_relations: int,
        tile_size: int = 256,
        tile_min_edges: Optional[int] = None,
        reorder: str = "lpa",
        feature_dim: int = 128,
        tile_dtype: str = "float32",
        plan_projected: bool = False,
        **ell_kwargs,
    ):
        # Residual rows average ~2-3 edges (the below-threshold tail), so
        # the narrowest ELL bucket width defaults tighter than the
        # standalone kernel's 4 (less padding -> fewer wasted gathers).
        ell_kwargs.setdefault("width_quantum", 2)
        # Projected mode (sum_r A_r (V W_r)): the tile part reuses its
        # per-relation tables unchanged — only the per-relation stitch
        # turns into an accumulate — but the ELL residual needs its own
        # projected plan.
        self._plan_projected = bool(plan_projected)
        ell_kwargs.setdefault("plan_projected", self._plan_projected)
        senders = np.asarray(senders, np.int64)
        receivers = np.asarray(receivers, np.int64)
        relations = np.asarray(relations, np.int64)
        weights = np.asarray(weights, np.float32)
        keep = weights != 0.0
        senders, receivers = senders[keep], receivers[keep]
        relations, weights = relations[keep], weights[keep]

        self.num_nodes = int(num_nodes)
        self.L = int(num_relations)
        B = int(tile_size)
        self.tile_size = B
        if tile_min_edges is None:
            tile_min_edges = default_min_edges(B, feature_dim)
        self.tile_min_edges = int(tile_min_edges)

        self.node_perm: Optional[np.ndarray] = None
        if reorder not in ("none", None) and len(senders):
            if reorder == "lpa":
                from grl_tpu.ops.reorder import lpa_order

                perm = lpa_order(senders, receivers, self.num_nodes)
            elif reorder == "rcm":
                from grl_tpu.ops.reorder import rcm_order

                perm = rcm_order(senders, receivers, self.num_nodes)
            else:
                raise ValueError(f"unknown reorder {reorder!r}")
            self.node_perm = perm
            senders = perm[senders]
            receivers = perm[receivers]

        nb = -(-self.num_nodes // B)
        self.nb = nb
        self._fwd_plans: List[Optional[_DirectionPlan]] = []
        self._bwd_plans: List[Optional[_DirectionPlan]] = []
        covered = np.zeros(len(senders), bool)
        self.tiles_total = 0
        for r in range(self.L):
            rsel = relations == r
            s_r, d_r, w_r = senders[rsel], receivers[rsel], weights[rsel]
            I, J = d_r // B, s_r // B
            key = I * nb + J
            cnt = np.bincount(key, minlength=nb * nb)
            dense_keys = np.nonzero(cnt >= self.tile_min_edges)[0]
            if len(dense_keys) == 0:
                self._fwd_plans.append(None)
                self._bwd_plans.append(None)
                continue
            in_tile = cnt[key] >= self.tile_min_edges
            covered[np.nonzero(rsel)[0][in_tile]] = True
            self.tiles_total += len(dense_keys)
            sc, dc, wc = s_r[in_tile], d_r[in_tile], w_r[in_tile]
            self._fwd_plans.append(
                _build_tile_tables(
                    out_blk=dc // B, src_blk=sc // B,
                    out_loc=dc % B, src_loc=sc % B,
                    weights=wc, nb=nb, B=B,
                    dense_key_set=dense_keys, dtype=tile_dtype,
                )
            )
            # backward: out block = SOURCE block, tiles transposed; the
            # tile set is the same, keyed (J, I).
            bwd_keys = np.unique(
                (dense_keys % nb) * nb + (dense_keys // nb)
            )
            self._bwd_plans.append(
                _build_tile_tables(
                    out_blk=sc // B, src_blk=dc // B,
                    out_loc=sc % B, src_loc=dc % B,
                    weights=wc, nb=nb, B=B,
                    dense_key_set=bwd_keys, dtype=tile_dtype,
                )
            )
        self.covered_edges = int(covered.sum())

        # Residual (below-threshold) edges keep their TRUE global ids on
        # the ELL tables; tile-covered edges use the endpoint-pair PRF —
        # streams are disjoint by edge, so DropEdge stays iid per edge.
        self._ell: Optional[ELLGraphKernel] = None
        if (~covered).any() or self.tiles_total == 0:
            self._ell = ELLGraphKernel(
                senders[~covered], receivers[~covered],
                relations[~covered], weights[~covered],
                num_nodes=self.num_nodes, num_relations=self.L,
                **ell_kwargs,
            )

        self.tables = TileTables(
            fwd=tuple(self._fwd_plans),
            bwd=tuple(self._bwd_plans),
            ell=self._ell.tables if self._ell is not None else None,
            # () = projected mode available (an empty pytree node, so the
            # marker is pure static structure GraphConv can branch on)
            proj=() if self._plan_projected else None,
        )

    def pad_features(self, V: jnp.ndarray) -> jnp.ndarray:
        return V

    def neighbor_aggregate(
        self, V: jnp.ndarray, seed=0, rate: float = 0.0, tables=None
    ) -> jnp.ndarray:
        """``(num_nodes, L*F)`` neighbor aggregation with fused DropEdge;
        differentiable w.r.t. ``V``.  Tile-covered edges run as MXU
        batched matmuls; residual edges through the ELL gather tables.
        ``tables``: the :class:`TileTables` pytree when threaded through
        a jit boundary as an argument (default: the kernel's own)."""
        tbl = tables if tables is not None else self.tables
        seed = jnp.asarray(seed)
        if self.tiles_total == 0:
            # No block cleared the density threshold (e.g. a uniformly
            # sparse graph): pure ELL, zero tile overhead.
            return self._ell.neighbor_aggregate(
                V, seed, rate, tables=tbl.ell
            )
        cfg = (self.tile_size, self.nb, self.L, self.num_nodes)
        out = tile_aggregate(
            (tbl.fwd, tbl.bwd), V, seed, cfg, float(rate)
        )
        if self._ell is not None:
            out = out + self._ell.neighbor_aggregate(
                V, seed, rate, tables=tbl.ell
            )
        return out

    def neighbor_aggregate_projected(
        self, Vr: jnp.ndarray, seed=0, rate: float = 0.0, tables=None
    ) -> jnp.ndarray:
        """Project-first aggregation: ``Vr (num_nodes·L, C)`` (row
        ``n·L + r`` = ``V[n] @ W_r``) -> relation-summed ``(num_nodes,
        C)``.  Requires ``plan_projected=True`` at construction (the
        tile part reuses its per-relation tables; the ELL residual uses
        its projected plan).  See ell_aggregate_projected for why: the
        gathers — and here also the tile matmuls — run at the OUTPUT
        width."""
        tbl = tables if tables is not None else self.tables
        if tbl.proj is None:
            raise ValueError(
                "tile kernel planned without plan_projected=True"
            )
        seed = jnp.asarray(seed)
        if self.tiles_total == 0:
            return self._ell.neighbor_aggregate_projected(
                Vr, seed, rate, tables=tbl.ell
            )
        cfg = (self.tile_size, self.nb, self.L, self.num_nodes)
        out = tile_aggregate_projected(
            (tbl.fwd, tbl.bwd), Vr, seed, cfg, float(rate)
        )
        if self._ell is not None:
            out = out + self._ell.neighbor_aggregate_projected(
                Vr, seed, rate, tables=tbl.ell
            )
        return out


def _tile_fwd_only(plans, V, seed, cfg, rate):
    fwd_plans, _ = plans
    B, nb, L, N = cfg
    pad_rows = nb * B - N
    F = V.shape[-1]
    Vblk = jnp.pad(V[:N], ((0, pad_rows), (0, 0))).reshape(nb, B, F)
    outs = []
    for r in range(L):
        plan = fwd_plans[r]
        if plan is None:
            outs.append(jnp.zeros((N, F), V.dtype))
            continue
        o = _apply_tables(
            plan, Vblk, B, seed, rate,
            rel_seed_mix=_rel_seed_mix(r), transposed=False,
        )
        outs.append(o.reshape(nb * B, F)[:N].astype(V.dtype))
    return jnp.stack(outs, axis=1).reshape(N, L * F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tile_aggregate(plans, V, seed, cfg, rate):
    """Tile-covered aggregation as a pure function of the
    ``(fwd_plans, bwd_plans)`` pytree; ``cfg = (B, nb, L, num_nodes)``
    static.  Differentiable w.r.t. ``V`` only."""
    return _tile_fwd_only(plans, V, seed, cfg, rate)


def _tile_vjp_fwd(plans, V, seed, cfg, rate):
    return _tile_fwd_only(plans, V, seed, cfg, rate), (plans, V, seed)


def _tile_vjp_bwd(cfg, rate, residuals, g):
    plans, V, seed = residuals
    _, bwd_plans = plans
    B, nb, L, N = cfg
    pad_rows = nb * B - N
    F = V.shape[-1]
    g3 = g.reshape(N, L, F)
    dV = jnp.zeros((nb, B, F), jnp.float32)
    for r in range(L):
        plan = bwd_plans[r]
        if plan is None:
            continue
        gblk = jnp.pad(g3[:, r, :], ((0, pad_rows), (0, 0))).reshape(nb, B, F)
        dV = dV + _apply_tables(
            plan, gblk, B, seed, rate,
            rel_seed_mix=_rel_seed_mix(r), transposed=True,
        )
    dV = dV.reshape(nb * B, F)[:N].astype(V.dtype)
    if V.shape[0] > N:
        dV = jnp.pad(dV, ((0, V.shape[0] - N), (0, 0)))
    d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return zero_cotangent(plans), dV, d_seed


tile_aggregate.defvjp(_tile_vjp_fwd, _tile_vjp_bwd)


def _tile_proj_fwd_only(plans, Vr, seed, cfg, rate):
    """Projected tile forward: ``Vr (N·L, C)`` relation-minor projected
    features -> relation-SUMMED ``(N, C)``.  Reuses the standard
    per-relation tables — only the per-relation concat becomes an
    accumulate — and the DropEdge PRF sees identical coordinates, so
    masks match the standard tile path exactly."""
    fwd_plans, _ = plans
    B, nb, L, N = cfg
    pad_rows = nb * B - N
    C = Vr.shape[-1]
    Vr3 = Vr[: N * L].reshape(N, L, C)
    out = jnp.zeros((nb, B, C), jnp.float32)
    for r in range(L):
        plan = fwd_plans[r]
        if plan is None:
            continue
        Vblk = jnp.pad(Vr3[:, r], ((0, pad_rows), (0, 0))).reshape(nb, B, C)
        out = out + _apply_tables(
            plan, Vblk, B, seed, rate,
            rel_seed_mix=_rel_seed_mix(r), transposed=False,
        )
    return out.reshape(nb * B, C)[:N].astype(Vr.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tile_aggregate_projected(plans, Vr, seed, cfg, rate):
    """PROJECT-FIRST tile aggregation (see grl_tpu.ops.ell.
    ell_aggregate_projected for the algebra); differentiable w.r.t.
    ``Vr`` only."""
    return _tile_proj_fwd_only(plans, Vr, seed, cfg, rate)


def _tile_proj_vjp_fwd(plans, Vr, seed, cfg, rate):
    return _tile_proj_fwd_only(plans, Vr, seed, cfg, rate), (plans, Vr, seed)


def _tile_proj_vjp_bwd(cfg, rate, residuals, g):
    plans, Vr, seed = residuals
    _, bwd_plans = plans
    B, nb, L, N = cfg
    pad_rows = nb * B - N
    C = Vr.shape[-1]
    gblk = jnp.pad(g[:N], ((0, pad_rows), (0, 0))).reshape(nb, B, C)
    parts = []
    for r in range(L):
        plan = bwd_plans[r]
        if plan is None:
            parts.append(jnp.zeros((N, C), jnp.float32))
            continue
        d = _apply_tables(
            plan, gblk, B, seed, rate,
            rel_seed_mix=_rel_seed_mix(r), transposed=True,
        )
        parts.append(d.reshape(nb * B, C)[:N])
    dVr = jnp.stack(parts, axis=1).reshape(N * L, C).astype(Vr.dtype)
    if Vr.shape[0] > N * L:
        dVr = jnp.pad(dVr, ((0, Vr.shape[0] - N * L), (0, 0)))
    d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return zero_cotangent(plans), dVr, d_seed


tile_aggregate_projected.defvjp(_tile_proj_vjp_fwd, _tile_proj_vjp_bwd)
