"""Microbenchmark: Pallas blocked-CSR SpMM vs XLA segment-sum on the TPU.

Measures the forward neighbor-aggregation at ogbn-arxiv scale (SBM
synthetic, same node/edge counts) for both sparse implementations, plus
the train-like forward+backward, and reports actual-nnz edges/s and the
HBM-bandwidth fraction (the sparse op is bandwidth-bound: its roofline is
set by one streamed pass over V per row-block sweep + output writes).

Usage: python scripts/bench_csr.py [--nodes N] [--avg-degree D] [--feat F]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v5e-class chip: ~819 GB/s HBM. The axon tunnel device reports no
# bandwidth; keep this a CLI override.
HBM_GBPS_DEFAULT = 819.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=169_343)
    p.add_argument("--avg-degree", type=int, default=7)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--relations", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--hbm-gbps", type=float, default=HBM_GBPS_DEFAULT)
    p.add_argument("--grad", action="store_true", help="also bench fwd+bwd")
    p.add_argument("--dropedge", type=float, default=0.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grl_tpu.data.large_graph import sbm_relational_graph, to_relational_graph
    from grl_tpu.ops.ell import ELLGraphKernel
    from grl_tpu.ops.pallas.csr_spmm import CSRGraphKernel
    from grl_tpu.ops.sparse import relational_neighbor_coo

    sbm = sbm_relational_graph(
        num_nodes=args.nodes, num_classes=40, num_relations=args.relations,
        avg_degree=args.avg_degree, feature_dim=args.feat, seed=0,
    )
    graph, feats = to_relational_graph(sbm)
    V = jnp.asarray(feats)
    E = int(np.asarray(graph.mask).sum())
    N, F, L = graph.num_nodes, V.shape[-1], graph.num_relations
    print(f"[csr-bench] device={jax.devices()[0]} N={N:,} E={E:,} F={F} L={L}")

    csr = CSRGraphKernel(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.relations), np.asarray(graph.weights),
        num_nodes=N, num_relations=L, feature_dim=F,
    )
    lay = csr._fwd
    print(
        f"[csr-bench] csr layout: blocks={lay.n_blocks} chunks={lay.n_chunks} "
        f"per_cell={lay.meta.shape[-1]} block_rows={lay.block_rows} "
        f"chunk_cols={lay.chunk_cols} "
        f"padded_edges={lay.n_blocks * lay.n_chunks * lay.meta.shape[-1]:,}"
    )
    ell = ELLGraphKernel(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.relations), np.asarray(graph.weights),
        num_nodes=N, num_relations=L,
    )
    ell_pad = sum(int(np.prod(b.idx.shape)) for b in ell._fwd)
    print(
        f"[csr-bench] ell layout: fwd buckets="
        f"{[tuple(b.idx.shape) for b in ell._fwd]} "
        f"padded_edges={ell_pad:,} ({ell_pad / max(E, 1):.2f}x nnz)"
    )

    from bench import chain_scalar, chained_time

    def timed(fn, *a):
        return chained_time(fn, *a, iters=args.iters)

    rate = args.dropedge

    # Honest tunnel-TPU timing (see bench.chained_time): every dispatch
    # varies in value and the loop ends with a host fetch — naive
    # repeat-same-call loops hit the runtime's value-memoization.
    @jax.jit
    def xla_fwd(v, s):
        return chain_scalar(relational_neighbor_coo(v * s, graph))

    @jax.jit
    def csr_fwd(v, s):
        return chain_scalar(csr.neighbor_aggregate(v * s, 0, rate))

    @jax.jit
    def ell_fwd(v, s):
        return chain_scalar(ell.neighbor_aggregate(v * s, 0, rate))

    # In-run gather-transaction ceiling (the true roofline for this op).
    probe_idx = jnp.asarray(
        np.random.RandomState(7).randint(0, N, E).astype(np.int32)
    )

    @jax.jit
    def gather_probe(v, s):
        return chain_scalar(jnp.take(v * s, probe_idx, axis=0))

    grate = E / timed(gather_probe, V)
    print(
        f"[csr-bench] measured gather ceiling: {grate / 1e6:.0f} M rows/s"
    )

    # Bandwidth model (forward): read V once per row-block sweep, write the
    # (N, L*F) output once, read edge metadata once.
    v_bytes = V.dtype.itemsize * N * F
    out_bytes = V.dtype.itemsize * N * L * F
    meta_bytes = 12 * E
    csr_bytes = lay.n_blocks * v_bytes + out_bytes + meta_bytes
    # XLA path: gather V rows (E*F), materialize (E,F) messages r+w, scatter.
    xla_bytes = (
        V.dtype.itemsize * E * F  # gather reads
        + 2 * 4 * E * F  # (E,F) f32 message tensor write+read
        + 4 * N * L * F  # scatter output
    )
    # ELL path: gather one V row per padded table entry, write output once.
    ell_bytes = V.dtype.itemsize * ell_pad * F + out_bytes + 8 * ell_pad

    for name, fn, nbytes in (("xla segsum", xla_fwd, xla_bytes),
                             ("pallas csr", csr_fwd, csr_bytes),
                             ("ell", ell_fwd, ell_bytes)):
        dt = timed(fn, V)
        frac = nbytes / dt / (args.hbm_gbps * 1e9)
        print(
            f"[csr-bench] {name:11s} fwd: {dt * 1e3:8.3f} ms  "
            f"{E / dt / 1e9:6.3f} B edges/s  {100 * E / dt / grate:5.1f}% of "
            f"gather ceiling  ~{100 * frac:5.1f}% HBM-byte model"
        )

    if args.grad:
        @jax.jit
        def xla_grad(v, s):
            g = jax.grad(
                lambda x: (relational_neighbor_coo(x, graph) ** 2).sum()
            )(v * s)
            return chain_scalar(g)

        @jax.jit
        def csr_grad(v, s):
            g = jax.grad(
                lambda x: (csr.neighbor_aggregate(x, 0, rate) ** 2).sum()
            )(v * s)
            return chain_scalar(g)

        @jax.jit
        def ell_grad(v, s):
            g = jax.grad(
                lambda x: (ell.neighbor_aggregate(x, 0, rate) ** 2).sum()
            )(v * s)
            return chain_scalar(g)

        for name, fn in (("xla segsum", xla_grad), ("pallas csr", csr_grad),
                         ("ell", ell_grad)):
            dt = timed(fn, V)
            print(
                f"[csr-bench] {name:11s} fwd+bwd: {dt * 1e3:8.3f} ms  "
                f"{E / dt / 1e9:6.3f} B edges/s  "
                f"{100 * E / dt / (grate / 2):5.1f}% of gather roofline"
            )


if __name__ == "__main__":
    main()
