"""Pallas TPU sparse SpMM: blocked-CSR relational aggregation + DropEdge.

The SURVEY §2.7 row-1 op: per-edge-type sparse neighbor aggregation
(the implied-native op behind the reference's dense aggregation matmul —
reference: gnn/models/networks/robust_gcn.py:45-47 — and its DropEdge
variant drop_robust_gcn.py:76-85), built as a real TPU kernel rather than
a Python stand-in.

Layout (host-planned once per graph, :func:`build_csr_layout`):

* edges are bucketed by **receiver block** (``block_rows`` output rows per
  grid step) and, within a block, by **sender chunk** (``chunk_cols`` rows
  of the gather operand resident in VMEM per grid step), then sorted by
  sender for locality and padded to one uniform per-(block, chunk) edge
  count. Relation ids are folded into the output row:
  ``row = r_local * L + rel`` — the output block is ``(block_rows*L, F)``
  and the full output reshapes to the relation-major ``(N, L*F)`` layout
  the GraphConv projection consumes (same as
  :func:`grl_tpu.ops.sparse.relational_neighbor_coo`).

* per-edge metadata is **packed into one int32** (``src << dst_bits | dst``)
  and staged through **SMEM** — the scalar memory the TPU's scalar core
  addresses natively, with no (8, 128) tile constraints; edge weights and
  DropEdge hash ids ride along in SMEM too.

* the kernel walks each (receiver-block, sender-chunk) cell's edge list
  with all operands on-chip. Mosaic only allows *8-aligned* dynamic
  sublane accesses, so the gather loads the aligned ``(8, F)`` tile
  containing the source row and extracts it with an iota-select reduce;
  the accumulate is an aligned ``(8, F)`` read-modify-write with an
  iota-select mask into a float32 VMEM scratch. The output tile is
  written once per block. HBM traffic is one streamed pass over V per
  row-block sweep, the edge metadata once, and the output once — the XLA
  segment-sum path additionally materializes the ``(E, F)`` message
  tensor in HBM.

* **DropEdge is fused** via a stateless per-edge hash of the global edge
  id (murmur-style finalizer), so the backward pass — the same kernel on
  the transposed layout (bucket by sender, gather from the cotangent) —
  regenerates the identical keep mask without storing it.

The custom VJP treats the adjacency as data (no dA), like the dense
kernels in :mod:`grl_tpu.ops.pallas.relagg`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip to True (e.g. in CPU tests) to run kernels in interpreter mode.
INTERPRET = False

_LANE = 128


class CSRLayout(NamedTuple):
    """Blocked-CSR edge layout for one gather/accumulate direction.

    ``meta`` is ``(n_cells, per_cell)`` int32 (packed ``src << dst_bits |
    dst`` — chunk-local gather row and block-local output row with the
    relation folded in); ``weight``/``gid`` are the same edges tiled
    ``(n_cells, per_cell/128, 128)`` for vector math. ``n_cells ==
    n_blocks * n_chunks`` row-major.
    """

    meta: jnp.ndarray  # int32 (n_cells, 1, per_cell)
    weight: jnp.ndarray  # float32 (n_cells, 1, per_cell)
    gid: jnp.ndarray  # int32 (n_cells, 1, per_cell)
    n_blocks: int
    n_chunks: int
    dst_bits: int
    block_rows: int  # output rows per block (BEFORE relation folding)
    chunk_cols: int  # gather rows per VMEM chunk
    num_out_rows: int  # logical output rows (before relation folding)
    num_src_rows: int  # logical gather rows
    out_relations: int  # relations folded into the output rows (L, or 1)
    unit_weights: bool  # all edge weights == 1.0 (skip the multiply)


def build_csr_layout(
    senders: np.ndarray,
    receivers: np.ndarray,
    relations: np.ndarray,
    weights: np.ndarray,
    num_out_rows: int,
    num_src_rows: int,
    num_relations: int,
    block_rows: int = 8192,
    chunk_cols: int = 16384,
    edge_quantum: int = 512,
    fold_relations: bool = True,
) -> CSRLayout:
    """Host-side planner: bucket edges by (receiver block, sender chunk).

    ``fold_relations=False`` is used for the transposed (backward) layout,
    where the relation instead selects the gather row
    (``src = sender * L + rel`` built by the caller).
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    relations = np.asarray(relations, np.int64)
    weights = np.asarray(weights, np.float32)
    valid = weights != 0.0
    gids = np.arange(len(senders), dtype=np.int64)

    L = num_relations if fold_relations else 1
    # int32 packing budget: src bits + dst bits (incl. relation and the
    # sacrificial padding row block_rows*L) <= 31.
    while (int(np.ceil(np.log2(max(chunk_cols, 2))))
           + int(np.ceil(np.log2(block_rows * L + 1)))) > 31:
        if chunk_cols >= block_rows:
            chunk_cols //= 2
        else:
            block_rows //= 2
    dst_bits = int(np.ceil(np.log2(block_rows * L + 1)))

    n_blocks = -(-num_out_rows // block_rows)
    n_chunks = -(-num_src_rows // chunk_cols)
    block_of = receivers // block_rows
    chunk_of = senders // chunk_cols
    cell = block_of * n_chunks + chunk_of

    # Sort edges by (cell, sender) — sender order gives gather locality.
    order = np.lexsort((senders, cell))
    order = order[valid[order]]  # drop zero-weight / padding edges
    cell_s = cell[order]
    counts = np.bincount(cell_s, minlength=n_blocks * n_chunks)
    per_cell = int(max(counts.max(), 1))
    quantum = max(edge_quantum, _LANE)  # lane-tileable weight/gid arrays
    per_cell = -(-per_cell // quantum) * quantum

    n_cells = n_blocks * n_chunks
    # Padding edges point at the sacrificial accumulator row block_rows*L
    # (src 0), so they are inert even on the unit-weight fast path that
    # skips the weight multiply.
    meta = np.full((n_cells, per_cell), block_rows * L, np.int32)
    gid = np.zeros((n_cells, per_cell), np.int32)
    wgt = np.zeros((n_cells, per_cell), np.float32)

    starts = np.searchsorted(cell_s, np.arange(n_cells))
    ends = np.searchsorted(cell_s, np.arange(n_cells) + 1)
    for c in range(n_cells):
        sel = order[starts[c]:ends[c]]
        if len(sel) == 0:
            continue
        b, ch = divmod(c, n_chunks)
        k = len(sel)
        src_local = senders[sel] - ch * chunk_cols
        dst_local = receivers[sel] - b * block_rows
        if fold_relations:
            dst_local = dst_local * num_relations + relations[sel]
        meta[c, :k] = ((src_local << dst_bits) | dst_local).astype(np.int32)
        gid[c, :k] = gids[sel].astype(np.int32)
        wgt[c, :k] = weights[sel]
    # (n_cells, 1, per_cell): the explicit middle 1 satisfies the TPU
    # block-shape rule (last two dims equal the array's) for SMEM.
    return CSRLayout(
        meta=jnp.asarray(meta.reshape(n_cells, 1, per_cell)),
        weight=jnp.asarray(wgt.reshape(n_cells, 1, per_cell)),
        gid=jnp.asarray(gid.reshape(n_cells, 1, per_cell)),
        n_blocks=n_blocks,
        n_chunks=n_chunks,
        dst_bits=dst_bits,
        block_rows=block_rows,
        chunk_cols=chunk_cols,
        num_out_rows=num_out_rows,
        num_src_rows=num_src_rows,
        out_relations=L,
        unit_weights=bool(np.all((wgt == 0.0) | (wgt == 1.0))),
    )


def _mix32(x):
    """murmur3 fmix32 avalanche round (elementwise, scalar-safe)."""
    x = x * jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _hash_keep(gid, seed, rate):
    """Stateless per-edge keep/rescale mask — a keyed PRF of
    (global edge id, seed). Identical in forward and transposed backward
    walks, so no mask tensor is ever stored. Works elementwise on arrays
    and on scalars (the in-kernel use).

    The seed is injected TWICE through different group operations
    (xor before the first mix, add before the second). A single
    ``mix(gid ^ seed)`` — the obvious construction — is NOT a PRF
    family: the kept-edge set at seed ``s`` is ``{g : g ^ s in K}``
    for one FIXED set ``K``, i.e. every DropEdge mask ever drawn is an
    XOR-translate of the same random set. Measured on the SBM
    full-graph benchmark this rigid mask family destroyed DropEdge's
    regularization benefit (val acc 0.41 vs 0.81 for iid bernoulli
    masks); the two-operation injection restores it (0.80).
    """
    s = seed.astype(jnp.uint32)
    x = _mix32(gid.astype(jnp.uint32) ^ s)
    x = _mix32(x + s)
    # Route the uint32->float cast via int32 (value < 2^24, so exact):
    # Mosaic has no scalar uint32->f32 cast.
    u = (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    keep = 1.0 - rate
    return (u < keep).astype(jnp.float32) / keep


def _make_kernel(per_cell: int, unroll: int, use_hash: bool, use_w: bool,
                 dst_bits: int, out_rows: int):
    """Edge-walk kernel: scalar unpack from SMEM, aligned-tile vector FMA
    into the VMEM accumulator.

    ``use_hash``/``use_w`` are compile-time: unit-weight graphs without
    DropEdge skip the weight pipeline entirely (pure gather-add).
    """
    dst_mask = (1 << dst_bits) - 1
    read_w = use_hash or use_w

    def kernel(seed_ref, rate_ref, meta_ref, w_ref, gid_ref,
               v_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        seed = seed_ref[0]
        rate = rate_ref[0]

        def body(k, _):
            for u in range(unroll):
                e = k * unroll + u
                m = meta_ref[0, 0, e]
                s = m >> dst_bits
                d = m & dst_mask
                # Mosaic requires dynamic sublane starts to be provably
                # 8-aligned: load the aligned (8, F) tile and iota-select.
                s_base = pl.multiple_of((s // 8) * 8, 8)
                tile = v_ref[pl.ds(s_base, 8), :].astype(jnp.float32)
                picked = jnp.where(sub_iota == (s - s_base), 1.0, 0.0)
                row = jnp.sum(tile * picked, axis=0, keepdims=True)  # (1, F)
                w = None
                if use_hash:
                    w = _hash_keep(gid_ref[0, 0, e], seed, rate)
                    if use_w:
                        w = w * w_ref[0, 0, e]
                elif use_w:
                    w = w_ref[0, 0, e]
                if w is not None:
                    row = row * w
                d_base = pl.multiple_of((d // 8) * 8, 8)
                dsel = jnp.where(sub_iota == (d - d_base), 1.0, 0.0)
                acc_ref[pl.ds(d_base, 8), :] += dsel * row

        jax.lax.fori_loop(0, per_cell // unroll, body, None)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            # The trailing scratch rows are the sacrificial padding sink.
            out_ref[0] = acc_ref[:out_rows, :].astype(out_ref.dtype)

    return kernel


def csr_accumulate(
    V: jnp.ndarray,
    layout: CSRLayout,
    seed,
    rate: float = 0.0,
    unroll: int = 8,
    out_dtype=None,
) -> jnp.ndarray:
    """Run the blocked gather-accumulate: ``out[dst] += w*mask * V[src]``.

    ``V`` is ``(num_src_rows_padded, F)`` (padded to a multiple of
    ``chunk_cols``); returns ``(n_blocks*block_rows*L, F)``.
    """
    n_cells, _, per_cell = layout.meta.shape
    n_blocks, n_chunks = layout.n_blocks, layout.n_chunks
    F = V.shape[-1]
    L = layout.out_relations
    rows_block = layout.block_rows * L
    use_hash = rate > 0.0
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    rate_arr = jnp.asarray(rate, jnp.float32).reshape(1)
    smem_spec = pl.BlockSpec(
        (1, 1, per_cell),
        lambda i, j, *_refs: (i * n_chunks + j, 0, 0),
        memory_space=pltpu.SMEM,
    )
    out = pl.pallas_call(
        _make_kernel(per_cell, unroll, use_hash, not layout.unit_weights,
                     layout.dst_bits, rows_block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks, n_chunks),
            in_specs=[
                smem_spec,
                smem_spec,
                smem_spec,
                pl.BlockSpec(
                    (layout.chunk_cols, F), lambda i, j, *_refs: (j, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_block, F), lambda i, j, *_refs: (i, 0, 0)
            ),
            scratch_shapes=[
                # +8 sublane rows: sacrificial sink for padding edges.
                pltpu.VMEM((rows_block + 8, F), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, rows_block, F), out_dtype or V.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n_cells * per_cell * F),
            bytes_accessed=int(
                V.dtype.itemsize * (n_blocks * layout.num_src_rows * F)
                + 12 * n_cells * per_cell
                + 4 * n_blocks * rows_block * F
            ),
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(seed_arr, rate_arr, layout.meta, layout.weight, layout.gid, V)
    return out.reshape(n_blocks * rows_block, F)


class CSRGraphKernel:
    """A planned sparse graph bound to forward + transposed CSR layouts.

    Build once per static graph (host-side), then call
    :meth:`neighbor_aggregate` inside jit — it closes over the layouts,
    so each planned graph compiles its own executable (the static-shape
    bucketing contract of the framework).
    """

    def __init__(
        self,
        senders: np.ndarray,
        receivers: np.ndarray,
        relations: np.ndarray,
        weights: np.ndarray,
        num_nodes: int,
        num_relations: int,
        block_rows: int = 8192,
        chunk_cols: int = 16384,
        edge_quantum: int = 512,
        unroll: int = 8,
        feature_dim: int = 128,
        vmem_budget: int = 12 * 1024 * 1024,
    ):
        senders = np.asarray(senders)
        receivers = np.asarray(receivers)
        relations = np.asarray(relations)
        weights = np.asarray(weights)
        self.num_nodes = int(num_nodes)
        self.L = int(num_relations)
        self.unroll = unroll

        def shrink(x):  # fit tiny graphs
            while x > 128 and x // 2 >= num_nodes:
                x //= 2
            return x

        block_rows = shrink(block_rows)
        chunk_cols = shrink(chunk_cols)
        # VMEM budget: f32 accumulator (block_rows*L rows) + the streamed
        # (double-buffered) V chunk must fit; shrink the larger dimension.
        def vmem_bytes(br, cc):
            return (br * self.L + 8) * feature_dim * 4 + 2 * cc * feature_dim * 4

        while vmem_bytes(block_rows, chunk_cols) > vmem_budget and (
            block_rows > 512 or chunk_cols > 512
        ):
            if block_rows * self.L >= chunk_cols:
                block_rows //= 2
            else:
                chunk_cols //= 2
        self._fwd = build_csr_layout(
            senders, receivers, relations, weights,
            num_out_rows=num_nodes, num_src_rows=num_nodes,
            num_relations=self.L, block_rows=block_rows,
            chunk_cols=chunk_cols, edge_quantum=edge_quantum,
            fold_relations=True,
        )
        # Transposed layout for dV: gather from the cotangent's
        # (num_nodes*L, F) row space, accumulate into sender rows.
        self._bwd = build_csr_layout(
            senders=receivers * self.L + relations,  # gather row in g-space
            receivers=senders,  # output row = sender
            relations=np.zeros_like(relations),
            weights=weights,
            num_out_rows=num_nodes, num_src_rows=num_nodes * self.L,
            num_relations=1, block_rows=block_rows,
            chunk_cols=chunk_cols * max(1, self.L), edge_quantum=edge_quantum,
            fold_relations=False,
        )
        # IMPORTANT: the DropEdge hash keys on the global edge id, which is
        # the *position* in the (senders, ...) arrays — identical for both
        # layouts by construction (same input order, zero-weight edges
        # dropped identically).

        self._src_rows_padded = self._fwd.n_chunks * self._fwd.chunk_cols
        self._g_rows_padded = self._bwd.n_chunks * self._bwd.chunk_cols

        L, unroll_ = self.L, unroll
        fwd, bwd = self._fwd, self._bwd
        num_nodes_ = self.num_nodes
        g_pad = self._g_rows_padded

        @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
        def neighbor_aggregate(Vp, seed, rate):
            out = csr_accumulate(Vp, fwd, seed, rate, unroll_)
            return out[: num_nodes_ * L].reshape(num_nodes_, L * Vp.shape[-1])

        def fwd_fn(Vp, seed, rate):
            return neighbor_aggregate(Vp, seed, rate), (Vp, seed)

        def bwd_fn(rate, residuals, g):
            Vp, seed = residuals
            F = Vp.shape[-1]
            g2 = g.reshape(num_nodes_ * L, F)
            g2 = jnp.pad(g2, ((0, g_pad - num_nodes_ * L), (0, 0)))
            dV = csr_accumulate(g2, bwd, seed, rate, unroll_, out_dtype=Vp.dtype)
            dV = dV[:num_nodes_]
            if Vp.shape[0] > num_nodes_:
                dV = jnp.pad(dV, ((0, Vp.shape[0] - num_nodes_), (0, 0)))
            d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
            return dV, d_seed

        neighbor_aggregate.defvjp(fwd_fn, bwd_fn)
        self._aggregate = neighbor_aggregate

    def pad_features(self, V: jnp.ndarray) -> jnp.ndarray:
        """Pad (num_nodes, F) features to the kernel's padded row count."""
        pad = self._src_rows_padded - V.shape[0]
        return jnp.pad(V, ((0, pad), (0, 0))) if pad > 0 else V

    def neighbor_aggregate(
        self, V: jnp.ndarray, seed=0, rate: float = 0.0
    ) -> jnp.ndarray:
        """``(num_nodes, L*F)`` neighbor aggregation (optionally DropEdge'd
        with the fused per-edge hash mask). Differentiable w.r.t. ``V``.
        ``seed`` may be a traced int32 scalar; ``rate`` must be static."""
        return self._aggregate(self.pad_features(V), jnp.asarray(seed), float(rate))


try:  # pragma: no cover - import cycle guard for standalone kernel use
    from grl_tpu.ops.sparse import RelationalGraph as _RelationalGraph
except ImportError:  # pragma: no cover
    _RelationalGraph = None


if _RelationalGraph is not None:
    import flax.struct

    @flax.struct.dataclass
    class CSRAdjacency(_RelationalGraph):
        """A :class:`RelationalGraph` bound to a planned Pallas CSR kernel.

        Duck-types as a RelationalGraph everywhere (SparseNodeSelfAtten,
        metrics, edge counting) while GraphConv routes the neighbor
        aggregation through :class:`CSRGraphKernel` — DropEdge fuses into
        the kernel via the stateless per-edge hash, so the config-level
        ``kernel_impl: pallas`` flag covers the sparse path too (the
        SURVEY §2.7 row-1 requirement; reference math:
        gnn/models/networks/robust_gcn.py:45-47, drop_robust_gcn.py:76-85).
        """

        kernel: "CSRGraphKernel" = flax.struct.field(
            pytree_node=False, default=None
        )
        # Optional fused sparse-attention plan (SDDMM+softmax+SpMM over
        # the same edge set) — SparseNodeSelfAtten routes through it when
        # present (grl_tpu/ops/pallas/sparse_attention.py).
        atten_kernel: object = flax.struct.field(
            pytree_node=False, default=None
        )
        # The kernel's table pytree as a TREE NODE: when the adjacency
        # crosses a jit boundary as an argument, the tables become XLA
        # parameters instead of embedded program constants — the tunnel's
        # compile service re-uploads constants on every compile and caps
        # request size (HTTP 413 at a few hundred MB), which the tile
        # kernel's inline tiles exceed. GraphConv passes this to
        # kernel.neighbor_aggregate(..., tables=...).
        kernel_tables: object = flax.struct.field(
            pytree_node=True, default=None
        )

    def attach_csr_kernel(
        graph: "_RelationalGraph", feature_dim: int = 256, **plan_kwargs
    ) -> "CSRAdjacency":
        """Plan a :class:`CSRGraphKernel` for a static graph (host-side,
        once) and return a :class:`CSRAdjacency` carrying both the COO
        arrays and the planned kernel. ``feature_dim`` should be the
        LARGEST feature width the model aggregates at (the VMEM budgeter
        sizes blocks so that width still fits)."""
        kernel = CSRGraphKernel(
            np.asarray(graph.senders),
            np.asarray(graph.receivers),
            np.asarray(graph.relations),
            np.asarray(
                graph.weights * graph.mask.astype(graph.weights.dtype)
            ),
            num_nodes=graph.num_nodes,
            num_relations=graph.num_relations,
            feature_dim=feature_dim,
            **plan_kwargs,
        )
        return CSRAdjacency(
            senders=graph.senders,
            receivers=graph.receivers,
            relations=graph.relations,
            weights=graph.weights,
            mask=graph.mask,
            num_nodes=graph.num_nodes,
            num_relations=graph.num_relations,
            batch_shape=graph.batch_shape,
            kernel=kernel,
        )
