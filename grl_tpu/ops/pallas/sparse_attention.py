"""Fused sparse attention: SDDMM + masked softmax + SpMM on ELL tables.

The sparse analog of the reference's dense node self-attention
(reference: gnn/models/networks/robust_gcn.py:78-99 — ``softmax(f V
(g V)^T) h V``; masked-softmax anchor: gatv2.py:238-247) restricted to
graph edges: scores only on edges, softmax per receiver, weighted sum of
sender values.

TPU-native design
-----------------
Segment-id softmax/sum (the XLA path in
:class:`grl_tpu.models.layers.SparseNodeSelfAtten`) pays the TPU's
serialized scatter-add in the backward.  Here the graph is planned as the
same dual degree-bucketed ELL gather tables that made the plain sparse
aggregation fast (:mod:`grl_tpu.ops.ell`): every receiver owns one padded
row of sender slots, so

* the per-receiver softmax becomes a **dense masked row softmax** over the
  table width W — no segment ops at all;
* the forward is one fused Pallas kernel per degree bucket: SDDMM
  (``f_r · g_nbr``), masked softmax, and the ``alpha · h_nbr`` reduction
  happen in VMEM — scores and alphas never round-trip HBM;
* the backward is **scatter-free in both directions**: receiver-major
  tables give ``df`` directly, and a sender-major table whose cells store
  each edge's flat position in the score table lets ``dg``/``dh`` gather
  the per-edge ``dscore``/``alpha`` values instead of scatter-adding them.

The gathers of ``g``/``h`` rows stay in XLA (``jnp.take`` — the op is
gather-transaction-bound like the ELL aggregate; docs/model-performance.md
has the measured ceiling); the Pallas kernel fuses everything after them.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grl_tpu.ops.ell import TablePlan, _Bucket, _build_tables

# Flip to True (e.g. in CPU tests) to run the fused kernel in interpreter
# mode; `USE_PALLAS = False` routes the forward through plain XLA ops.
INTERPRET = False
USE_PALLAS = True

# Hub buckets wider than this use the XLA forward (their (rows, W, F)
# VMEM blocks would not fit; they hold a handful of rows).
MAX_PALLAS_WIDTH = 32


def _row_softmax(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked softmax over the table width; all-padding rows yield zeros
    (matches segment_softmax on zero-degree receivers)."""
    scores = jnp.where(valid, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(valid, jnp.exp(scores - m), 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(denom == 0.0, 1.0, denom)


def _bucket_forward_xla(f_b, hg_nbr, valid, F: int):
    """(rows, F), (rows, W) = fused SDDMM+softmax+SpMM, reference path.

    ``hg_nbr (rows, W, F+K)`` packs each gathered neighbor's value row
    (first F lanes) and key row (last K): the h and g gathers share one
    HBM transaction per edge — the op is gather-transaction-bound, so
    halving transactions ~halves its cost.
    """
    h_nbr = hg_nbr[..., :F].astype(jnp.float32)
    g_nbr = hg_nbr[..., F:].astype(jnp.float32)
    scores = jnp.einsum("rk,rwk->rw", f_b.astype(jnp.float32), g_nbr)
    alpha = _row_softmax(scores, valid)
    out = jnp.einsum("rw,rwf->rf", alpha, h_nbr)
    return out, alpha


def _atten_kernel(f_ref, hg_ref, v_ref, out_ref, alpha_ref, *, F: int):
    """One (rows-block) step: scores, masked softmax and the weighted
    reduction all in VMEM (f32 math). ``hg`` packs [value | key] rows;
    F is lane-aligned by construction so the split is free."""
    f = f_ref[...].astype(jnp.float32)  # (R, K)
    hg = hg_ref[...].astype(jnp.float32)  # (R, W, F+K)
    h, g = hg[..., :F], hg[..., F:]
    valid = v_ref[...]  # (R, W) bool
    scores = jnp.sum(f[:, None, :] * g, axis=-1)  # (R, W)
    alpha = _row_softmax(scores, valid)
    alpha_ref[...] = alpha
    out_ref[...] = jnp.sum(alpha[:, :, None] * h, axis=1)


def _bucket_forward_pallas(f_b, hg_nbr, valid, F: int, block_rows: int = 256):
    rows, W, FK = hg_nbr.shape
    K = f_b.shape[-1]
    pad = -rows % block_rows
    if pad:
        f_b = jnp.pad(f_b, ((0, pad), (0, 0)))
        hg_nbr = jnp.pad(hg_nbr, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    padded = rows + pad
    grid = (padded // block_rows,)
    out, alpha = pl.pallas_call(
        functools.partial(_atten_kernel, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, K), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, W, FK), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_rows, W), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, F), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, W), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, F), jnp.float32),
            jax.ShapeDtypeStruct((padded, W), jnp.float32),
        ],
        interpret=INTERPRET,
    )(f_b, hg_nbr, valid)
    return out[:rows], alpha[:rows]


class SparseAttentionKernel:
    """A static edge set planned for fused edge-restricted attention.

    ``attend(f, g, h) -> (num_nodes, F)`` where ``f``/``g`` are the
    per-node query/key projections ``(num_nodes, K)`` and ``h`` the value
    projection ``(num_nodes, F)``; differentiable in all three.
    Built host-side once per graph (the framework's static-graph
    contract), like :class:`grl_tpu.ops.ell.ELLGraphKernel`.
    """

    def __init__(
        self,
        senders: np.ndarray,
        receivers: np.ndarray,
        num_nodes: int,
        width_quantum: int = 8,
        bucket_growth: int = 2,
    ):
        senders = np.asarray(senders, np.int64)
        receivers = np.asarray(receivers, np.int64)
        self.num_nodes = int(num_nodes)
        E = len(senders)
        ones = np.ones(E, np.float32)
        gids = np.arange(E, dtype=np.int64)

        # Receiver-major: row r lists its sender slots (fwd + df).
        fwd = _build_tables(
            out_row=receivers, src_row=senders, weights=ones, gids=gids,
            num_out_rows=self.num_nodes, width_quantum=width_quantum,
            bucket_growth=bucket_growth,
        )
        # Sender-major: row s lists its receivers AND — via gid := the
        # edge's flat cell in the receiver-major score table — where to
        # gather that edge's dscore/alpha from (scatter-free dg/dh).
        bwd = _build_tables(
            out_row=senders, src_row=receivers, weights=ones,
            gids=fwd.edge_flat,
            num_out_rows=self.num_nodes, width_quantum=width_quantum,
            bucket_growth=bucket_growth,
        )
        self._fwd, self._bwd = fwd, bwd
        # Per-bucket receiver row ids (for gathering f rows / dout rows).
        self._fwd_rows = _split_rows(fwd)
        self._bwd_rows = _split_rows(bwd)
        self._flat_len = int(
            sum(int(np.prod(b.idx.shape)) for b in fwd.buckets)
        )

        num_nodes_ = self.num_nodes
        fwd_plan, bwd_plan = self._fwd, self._bwd
        fwd_rows, bwd_rows = self._fwd_rows, self._bwd_rows
        flat_len = self._flat_len

        def _forward_parts(f, g, h):
            F = h.shape[-1]
            hg = jnp.concatenate([h, g], axis=-1)  # one gather source
            outs, alphas = [], []
            for b, rows in zip(fwd_plan.buckets, fwd_rows):
                f_b = jnp.take(f, rows, axis=0)
                hg_nbr = jnp.take(hg, b.idx, axis=0)
                valid = b.weight > 0.0
                use_pallas = (
                    USE_PALLAS and b.idx.shape[1] <= MAX_PALLAS_WIDTH
                )
                fn = _bucket_forward_pallas if use_pallas else _bucket_forward_xla
                out_b, alpha_b = fn(f_b, hg_nbr, valid, F)
                outs.append(out_b)
                alphas.append(alpha_b)
            return outs, alphas

        @jax.custom_vjp
        def attend(f, g, h):
            outs, _ = _forward_parts(f, g, h)
            out = jnp.take(jnp.concatenate(outs, axis=0), fwd_plan.inv_perm, axis=0)
            return out.astype(h.dtype)

        def attend_fwd(f, g, h):
            return attend(f, g, h), (f, g, h)

        def attend_bwd(residuals, dout):
            f, g, h = residuals
            F = h.shape[-1]
            dout32 = dout.astype(jnp.float32)
            hg = jnp.concatenate([h, g], axis=-1).astype(jnp.float32)
            df_parts, dscore_parts, alpha_parts = [], [], []
            # Receiver-major walk: recompute scores/alpha per bucket (cheap
            # next to the gathers), then df directly; stash the per-edge
            # dscore/alpha tables (raveled) for the sender-major walk.
            for b, rows in zip(fwd_plan.buckets, fwd_rows):
                f_b = jnp.take(f, rows, axis=0).astype(jnp.float32)
                hg_nbr = jnp.take(hg, b.idx, axis=0)
                h_nbr, g_nbr = hg_nbr[..., :F], hg_nbr[..., F:]
                valid = b.weight > 0.0
                scores = jnp.einsum("rk,rwk->rw", f_b, g_nbr)
                alpha = _row_softmax(scores, valid)
                dout_b = jnp.take(dout32, rows, axis=0)
                dalpha = jnp.einsum("rf,rwf->rw", dout_b, h_nbr)
                dscore = alpha * (
                    dalpha - jnp.sum(alpha * dalpha, axis=-1, keepdims=True)
                )
                df_parts.append(jnp.einsum("rw,rwk->rk", dscore, g_nbr))
                dscore_parts.append(dscore.ravel())
                alpha_parts.append(alpha.ravel())
            df = jnp.take(
                jnp.concatenate(df_parts, axis=0), fwd_plan.inv_perm, axis=0
            )
            # Per-edge (dscore, alpha) pairs packed so the sender-major
            # walk gathers both with one transaction per edge.
            sa = jnp.stack(
                [jnp.concatenate(dscore_parts), jnp.concatenate(alpha_parts)],
                axis=-1,
            )
            doutf = jnp.concatenate([dout32, f.astype(jnp.float32)], axis=-1)

            # Sender-major walk: dg[s] = sum_e dscore_e f[recv_e],
            # dh[s] = sum_e alpha_e dout[recv_e] — pure gathers.
            dg_parts, dh_parts = [], []
            for b, rows in zip(bwd_plan.buckets, bwd_rows):
                valid = b.weight > 0.0
                pair = jnp.take(sa, b.gid, axis=0)
                dsc = jnp.where(valid, pair[..., 0], 0.0)
                al = jnp.where(valid, pair[..., 1], 0.0)
                doutf_nbr = jnp.take(doutf, b.idx, axis=0)
                dout_nbr, f_nbr = doutf_nbr[..., :F], doutf_nbr[..., F:]
                dg_parts.append(jnp.einsum("rw,rwk->rk", dsc, f_nbr))
                dh_parts.append(jnp.einsum("rw,rwf->rf", al, dout_nbr))
            dg = jnp.take(
                jnp.concatenate(dg_parts, axis=0), bwd_plan.inv_perm, axis=0
            )
            dh = jnp.take(
                jnp.concatenate(dh_parts, axis=0), bwd_plan.inv_perm, axis=0
            )
            return df.astype(f.dtype), dg.astype(g.dtype), dh.astype(h.dtype)

        attend.defvjp(attend_fwd, attend_bwd)
        self._attend = attend

    def attend(self, f: jnp.ndarray, g: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        if f.shape[0] != self.num_nodes:
            raise ValueError(
                f"attend expects (num_nodes={self.num_nodes}, K) projections, "
                f"got {f.shape}"
            )
        return self._attend(f, g, h)


def _split_rows(plan: TablePlan) -> List[jnp.ndarray]:
    """Per-bucket out-row ids (slices of the concatenated permutation)."""
    rows = []
    off = 0
    for b in plan.buckets:
        n = b.idx.shape[0]
        rows.append(jnp.asarray(plan.perm[off:off + n].astype(np.int32)))
        off += n
    return rows
