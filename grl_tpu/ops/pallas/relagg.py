"""Pallas TPU kernels for relational aggregation (the dense SpMM hot op).

Both kernels consume the dataset layout directly: the adjacency
``A (B, N, L, N)`` is viewed as ``(B, N, L*N)`` (a free reshape) and the
BlockSpec index maps pick the ``(block_n, block_k)`` tile of relation
``l`` at element offset ``(b, i*block_n, l*N + k*block_k)`` — no HBM
transpose of the dominant operand, ever. The output is written in the
dataset layout ``(B, N, L, F)`` (viewed ``(B, N, L*F)``) in the operand
dtype, with accumulation in a float32 VMEM scratch; round-1 versions
paid two full extra HBM round-trips per call (transpose in, transpose +
cast out) which made the kernel lose to plain XLA.

* :func:`pallas_neighbor_aggregate` — per-relation neighbor matmul
  ``out[b,n,l,:] = sum_m A[b,n,l,m] V[b,m,:]`` as an MXU-tiled blocked
  matmul.

* :func:`pallas_dropedge_aggregate` — the same matmul with the DropEdge
  bernoulli mask **generated inside the kernel** from the TPU PRNG and
  fused into the A tile. The XLA path materializes a ``(B,N,L+1,N)``
  mask plus a dropped copy of A in HBM every layer
  (grl_tpu/ops/relconv.py:drop_edge); the fused kernel reads A once and
  writes only the aggregate. The backward pass regenerates the identical
  mask (same per-tile seeds) in a transposed-walk kernel — no mask is
  ever stored.

Both carry a custom VJP: dV is a transposed aggregation; dA (plain
kernel) is computed with XLA ops and dead-code-eliminated under jit when
— as always in training — the adjacency is data, not a parameter.

Reference semantics anchor: gnn/models/networks/robust_gcn.py:45-47
(the aggregation matmul) and drop_robust_gcn.py:38,76 (Dropout on the
preprocessed adjacency).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip to True (e.g. in CPU tests) to run kernels in interpreter mode.
INTERPRET = False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_block(n: int, requested: int) -> int:
    """Largest power-of-two tile <= requested that divides n (min 128)."""
    b = requested
    while b > 128 and n % b:
        b //= 2
    if n % b:
        raise ValueError(
            f"pallas relagg requires the node dim ({n}) to be a multiple "
            f"of 128; pad with BucketPadding(quantum=128)."
        )
    return b


def _uniform_mask(shape, rate_ref):
    """iid keep mask with 1/keep rescale from the per-core PRNG."""
    bits = pltpu.prng_random_bits(shape)
    keep = 1.0 - rate_ref[0]
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u < keep).astype(jnp.float32) / keep


# ---------------------------------------------------------------------------
# Plain neighbor aggregation kernel
# ---------------------------------------------------------------------------
def _agg_kernel(a_ref, v_ref, out_ref, acc_ref):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[0], v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _agg_forward(V, A, block_n, block_k):
    B, N, L, _ = A.shape
    F = V.shape[-1]
    block_n = _pick_block(N, block_n)
    block_k = _pick_block(N, block_k)
    n_k = _cdiv(N, block_k)
    grid = (B, L, _cdiv(N, block_n), n_k)
    out = pl.pallas_call(
        _agg_kernel,
        grid=grid,
        in_specs=[
            # A viewed (B, N, L*N): tile (i, k) of relation l.
            pl.BlockSpec(
                (1, block_n, block_k), lambda b, l, i, k: (b, i, l * n_k + k)
            ),
            pl.BlockSpec((1, block_k, F), lambda b, l, i, k: (b, k, 0)),
        ],
        # out viewed (B, N, L*F): written once per (b, l, i) at the last k.
        out_specs=pl.BlockSpec((1, block_n, F), lambda b, l, i, k: (b, i, l)),
        out_shape=jax.ShapeDtypeStruct((B, N, L * F), V.dtype),
        scratch_shapes=[pltpu.VMEM((block_n, F), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * N * L * N * F),
            bytes_accessed=int(
                A.dtype.itemsize * B * N * L * N
                + V.dtype.itemsize * (B * N * F + B * N * L * F)
            ),
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(A.reshape(B, N, L * N), V)
    return out.reshape(B, N, L, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_neighbor_aggregate(V, A, block_n: int = 256, block_k: int = 256):
    """``(B,N,L,F)`` neighbor aggregate of ``V (B,N,F)`` by ``A (B,N,L,N)``."""
    return _agg_forward(V, A, block_n, block_k)


def _agg_fwd(V, A, block_n, block_k):
    return pallas_neighbor_aggregate(V, A, block_n, block_k), (V, A)


def _agg_bwd(block_n, block_k, residuals, g):
    V, A = residuals
    # dV[b,m,f] = sum_{n,l} A[b,n,l,m] g[b,n,l,f]
    dV = jnp.einsum("bnlm,bnlf->bmf", A, g)
    # dA[b,n,l,m] = g[b,n,l,:] . V[b,m,:] — DCE'd when A is data.
    dA = jnp.einsum("bnlf,bmf->bnlm", g, V)
    return dV.astype(V.dtype), dA.astype(A.dtype)


pallas_neighbor_aggregate.defvjp(_agg_fwd, _agg_bwd)


# ---------------------------------------------------------------------------
# Fused DropEdge aggregation kernel
# ---------------------------------------------------------------------------
def _fwd_tile_seed(seed_ref, b, l, i, k, n_l, n_i, n_k):
    """One seed per logical (b, l, i, k) A-tile; the backward kernel
    reproduces it from its transposed walk so masks match exactly."""
    return seed_ref[0] + ((b * n_l + l) * n_i + i) * n_k + k


def _dropedge_kernel(seed_ref, rate_ref, a_ref, v_ref, out_ref, acc_ref):
    b, l, i, k = (pl.program_id(d) for d in range(4))

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pltpu.prng_seed(
        _fwd_tile_seed(
            seed_ref, b, l, i, k,
            pl.num_programs(1), pl.num_programs(2), pl.num_programs(3),
        )
    )
    a_tile = a_ref[0]
    # Mask (incl. 1/keep rescale) computed in f32, applied in the operand
    # dtype so a bf16 A tile keeps the dot single-pass on the MXU.
    mask = _uniform_mask(a_tile.shape, rate_ref).astype(a_tile.dtype)
    acc_ref[...] += jnp.dot(
        a_tile * mask, v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _dropedge_bwd_kernel(seed_ref, rate_ref, a_ref, g_ref, out_ref, acc_ref):
    """dV tile accumulation: sum over (l, i) of (A*mask)^T @ g."""
    b, m, l, i = (pl.program_id(d) for d in range(4))

    @pl.when(jnp.logical_and(l == 0, i == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Forward tile (b, l, i, k=m) was seeded with n_l=#l, n_i=#i, n_k=#m.
    pltpu.prng_seed(
        _fwd_tile_seed(
            seed_ref, b, l, i, m,
            pl.num_programs(2), pl.num_programs(3), pl.num_programs(1),
        )
    )
    a_tile = a_ref[0]  # (block_n rows = i, block_k cols = m)
    mask = _uniform_mask(a_tile.shape, rate_ref).astype(a_tile.dtype)
    acc_ref[...] += jnp.dot(
        (a_tile * mask).T, g_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(
        jnp.logical_and(
            l == pl.num_programs(2) - 1, i == pl.num_programs(3) - 1
        )
    )
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _dropedge_forward(V, A, seed, rate, block_n, block_k):
    B, N, L, _ = A.shape
    F = V.shape[-1]
    n_k = _cdiv(N, block_k)
    grid = (B, L, _cdiv(N, block_n), n_k)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    rate_arr = jnp.asarray(rate, jnp.float32).reshape(1)
    out = pl.pallas_call(
        _dropedge_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_n, block_k),
                    lambda b, l, i, k, *_refs: (b, i, l * n_k + k),
                ),
                pl.BlockSpec((1, block_k, F), lambda b, l, i, k, *_refs: (b, k, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_n, F), lambda b, l, i, k, *_refs: (b, i, l)
            ),
            scratch_shapes=[pltpu.VMEM((block_n, F), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, L * F), V.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * N * L * N * F),
            bytes_accessed=int(
                A.dtype.itemsize * B * N * L * N
                + V.dtype.itemsize * (B * N * F + B * N * L * F)
            ),
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(seed_arr, rate_arr, A.reshape(B, N, L * N), V)
    return out.reshape(B, N, L, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_dropedge_aggregate(
    V, A, seed, rate: float, block_n: int = 256, block_k: int = 256
):
    """Neighbor aggregation with fused in-kernel DropEdge.

    Same semantics as ``drop_edge`` + ``relational_aggregate`` restricted
    to the neighbor relations (the self relation's diagonal mask is cheap
    and handled by the caller), without materializing the mask or the
    dropped adjacency in HBM. Returns ``(B, N, L, F)``.
    """
    N = A.shape[1]
    block_n = _pick_block(N, block_n)
    block_k = _pick_block(N, block_k)
    return _dropedge_forward(V, A, seed, rate, block_n, block_k)


def _dropedge_fwd(V, A, seed, rate, block_n, block_k):
    return pallas_dropedge_aggregate(V, A, seed, rate, block_n, block_k), (V, A, seed)


def _dropedge_bwd(rate, block_n, block_k, residuals, g):
    V, A, seed = residuals
    B, N, L, _ = A.shape
    F = V.shape[-1]
    block_n = _pick_block(N, block_n)
    block_k = _pick_block(N, block_k)
    n_k = _cdiv(N, block_k)
    # Grid: out block (b, m) fixed while (l, i) accumulate.
    grid = (B, n_k, L, _cdiv(N, block_n))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    rate_arr = jnp.asarray(rate, jnp.float32).reshape(1)
    g_flat = g.reshape(B, N, L * F)
    dV = pl.pallas_call(
        _dropedge_bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                # Forward A tile (b, l, i, k=m) from the (B, N, L*N) view.
                pl.BlockSpec(
                    (1, block_n, block_k),
                    lambda b, m, l, i, *_refs: (b, i, l * n_k + m),
                ),
                # g viewed (B, N, L*F): block (b, i, l).
                pl.BlockSpec(
                    (1, block_n, F), lambda b, m, l, i, *_refs: (b, i, l)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_k, F), lambda b, m, l, i, *_refs: (b, m, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_k, F), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, F), V.dtype),
        interpret=INTERPRET,
    )(seed_arr, rate_arr, A.reshape(B, N, L * N), g_flat)
    # Cotangents for A and seed are data-path only: DCE'd under jit.
    dA = jnp.zeros_like(A)
    d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dV, dA, d_seed


pallas_dropedge_aggregate.defvjp(_dropedge_fwd, _dropedge_bwd)
