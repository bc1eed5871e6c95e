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

    kern = CSRGraphKernel(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.relations), np.asarray(graph.weights),
        num_nodes=N, num_relations=L, feature_dim=F,
    )
    lay = kern._fwd
    print(
        f"[csr-bench] layout: blocks={lay.n_blocks} chunks={lay.n_chunks} "
        f"per_cell={lay.meta.shape[-1]} block_rows={lay.block_rows} "
        f"chunk_cols={lay.chunk_cols} "
        f"padded_edges={lay.n_blocks * lay.n_chunks * lay.meta.shape[-1]:,}"
    )

    def timed(fn, *a):
        out = jax.block_until_ready(fn(*a))
        start = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - start) / args.iters

    rate = args.dropedge

    @jax.jit
    def xla_fwd(v):
        return relational_neighbor_coo(v, graph)

    @jax.jit
    def csr_fwd(v):
        return kern.neighbor_aggregate(v, 0, rate)

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

    for name, fn, nbytes in (("xla segsum", xla_fwd, xla_bytes),
                             ("pallas csr", csr_fwd, csr_bytes)):
        dt = timed(fn, V)
        frac = nbytes / dt / (args.hbm_gbps * 1e9)
        print(
            f"[csr-bench] {name:11s} fwd: {dt * 1e3:8.3f} ms  "
            f"{E / dt / 1e9:6.2f} B edges/s  ~{100 * frac:5.1f}% HBM roofline"
        )

    if args.grad:
        @jax.jit
        def xla_grad(v):
            return jax.grad(lambda x: relational_neighbor_coo(x, graph).sum())(v)

        @jax.jit
        def csr_grad(v):
            return jax.grad(
                lambda x: kern.neighbor_aggregate(x, 0, rate).sum()
            )(v)

        for name, fn in (("xla segsum", xla_grad), ("pallas csr", csr_grad)):
            dt = timed(fn, V)
            print(
                f"[csr-bench] {name:11s} fwd+bwd: {dt * 1e3:8.3f} ms  "
                f"{2 * E / dt / 1e9:6.2f} B edge-ops/s"
            )


if __name__ == "__main__":
    main()
