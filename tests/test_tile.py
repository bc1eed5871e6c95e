"""Tile-dense hybrid kernel (grl_tpu/ops/tile.py): parity, DropEdge,
reordering, and product wiring (kernel_impl="tile").

Reference math being matched: gnn/models/networks/robust_gcn.py:45-47;
the XLA gather+segment-sum path is the numerical oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grl_tpu.data.large_graph import sbm_relational_graph
from grl_tpu.ops.sparse import RelationalGraph, relational_neighbor_coo
from grl_tpu.ops.tile import TileGraphKernel, default_min_edges


def clustered_graph(seed=0, N=700, L=2, E=9000, n_com=5, intra=0.8):
    """Community-clustered random graph with scattered node ids."""
    rng = np.random.RandomState(seed)
    com = rng.randint(0, n_com, N)
    send = rng.randint(0, N, E)
    # receivers: mostly same community
    order = np.argsort(com, kind="stable")
    starts = np.searchsorted(com[order], np.arange(n_com))
    counts = np.bincount(com, minlength=n_com)
    same = rng.rand(E) < intra
    pick = rng.randint(0, np.maximum(counts[com[send]], 1))
    recv = np.where(
        same, order[starts[com[send]] + pick], rng.randint(0, N, E)
    )
    rel = rng.randint(0, L, E)
    w = rng.rand(E).astype(np.float32) + 0.5
    return send, recv, rel, w, N, L


def to_graph(send, recv, rel, w, N, L):
    E = len(send)
    return RelationalGraph(
        senders=jnp.asarray(send.astype(np.int32)),
        receivers=jnp.asarray(recv.astype(np.int32)),
        relations=jnp.asarray(rel.astype(np.int32)),
        weights=jnp.asarray(w),
        mask=jnp.ones(E, bool),
        num_nodes=N,
        num_relations=L,
    )


class TestTileKernelParity:
    @pytest.mark.parametrize("reorder", ["none", "lpa"])
    def test_forward_and_grad_match_xla(self, reorder):
        send, recv, rel, w, N, L = clustered_graph()
        graph = to_graph(send, recv, rel, w, N, L)
        F = 16
        V = np.random.RandomState(1).randn(N, F).astype(np.float32)
        ref = np.asarray(relational_neighbor_coo(jnp.asarray(V), graph))
        g_ref = np.asarray(
            jax.grad(
                lambda v: (relational_neighbor_coo(v, graph) ** 2).sum()
            )(jnp.asarray(V))
        )

        kern = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40, reorder=reorder,
        )
        assert kern.tiles_total > 0, "test graph must actually select tiles"
        assert kern.covered_edges > 0
        Vk = V
        if kern.node_perm is not None:
            Vk = np.zeros_like(V)
            Vk[kern.node_perm] = V
        out = np.asarray(kern.neighbor_aggregate(jnp.asarray(Vk)))
        gk = np.asarray(
            jax.grad(lambda v: (kern.neighbor_aggregate(v) ** 2).sum())(
                jnp.asarray(Vk)
            )
        )
        if kern.node_perm is not None:
            out, gk = out[kern.node_perm], gk[kern.node_perm]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gk, g_ref, rtol=1e-3, atol=1e-3)

    def test_lpa_reorder_increases_coverage(self):
        # Scattered community ids: raw blocks are uniformly sparse, the
        # LPA order must pack communities to create dense tiles.
        send, recv, rel, w, N, L = clustered_graph(seed=3)
        plain = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40, reorder="none",
        )
        lpa = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40, reorder="lpa",
        )
        assert lpa.covered_edges > 1.5 * max(plain.covered_edges, 1)

    def test_uniform_graph_degrades_to_ell(self):
        rng = np.random.RandomState(5)
        N, E = 2000, 6000
        kern = TileGraphKernel(
            rng.randint(0, N, E), rng.randint(0, N, E),
            np.zeros(E, np.int64), np.ones(E, np.float32),
            num_nodes=N, num_relations=1, tile_size=256, reorder="none",
        )
        assert kern.tiles_total == 0
        assert kern.covered_edges == 0
        # still numerically correct through the ELL fallback
        V = rng.randn(N, 8).astype(np.float32)
        graph = to_graph(
            rng.randint(0, N, 0), rng.randint(0, N, 0),
            np.zeros(0, np.int64), np.ones(0, np.float32), N, 1,
        )
        out = kern.neighbor_aggregate(jnp.asarray(V))
        assert out.shape == (N, 8)

    def test_default_min_edges_scale(self):
        # the cost model should land in the hundreds for 256-tiles
        assert 100 <= default_min_edges(256, 128) <= 1000
        assert default_min_edges(128, 128) < default_min_edges(256, 128)


class TestTileDropEdge:
    def test_mean_preservation(self):
        send, recv, rel, w, N, L = clustered_graph(seed=7, E=6000)
        kern = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40, reorder="none",
        )
        V = np.random.RandomState(2).randn(N, 12).astype(np.float32)
        base = np.asarray(kern.neighbor_aggregate(jnp.asarray(V)))
        agg = jax.jit(
            lambda v, s: kern.neighbor_aggregate(v, seed=s, rate=0.3)
        )
        outs = [np.asarray(agg(jnp.asarray(V), s)) for s in range(40)]
        err = np.abs(np.mean(outs, 0) - base).mean() / np.abs(base).mean()
        assert err < 0.12, f"DropEdge mean drifts: rel err {err}"
        # different seeds give different masks
        assert np.abs(outs[0] - outs[1]).max() > 1e-3

    def test_fwd_bwd_mask_consistency(self):
        """The endpoint-pair PRF must regenerate IDENTICAL masks in the
        forward (recv-major) and backward (send-major) tile layouts.

        Checked as a FULL numerical-vs-reverse-mode Jacobian on a small
        all-tiled multi-relation graph (small so float32 finite
        differences stay well-conditioned — a projected-sum loss at
        N=700 has |f| ~ 5e2 and its FD noise ~|f|·1e-7/eps swamps any
        single edge's contribution)."""
        rng = np.random.RandomState(9)
        N, B, F, L, E = 24, 8, 3, 2, 150
        send = rng.randint(0, N, E)
        recv = rng.randint(0, N, E)
        rel = rng.randint(0, L, E)
        w = rng.rand(E).astype(np.float32) + 0.5
        kern = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=B, tile_min_edges=1, reorder="none",
        )
        assert kern.covered_edges == E, "all edges must run on tiles"
        V = jnp.asarray(rng.randn(N, F).astype(np.float32))

        def f(v):
            return kern.neighbor_aggregate(v, seed=5, rate=0.3)

        J = np.asarray(jax.jacrev(f)(V))  # backward tables
        eps = 1e-3
        V0 = np.asarray(V)
        for i in range(N):
            for j in range(F):
                vp, vm = V0.copy(), V0.copy()
                vp[i, j] += eps
                vm[i, j] -= eps
                fd = (
                    np.asarray(f(jnp.asarray(vp)))
                    - np.asarray(f(jnp.asarray(vm)))
                ) / (2 * eps)  # forward tables only
                np.testing.assert_allclose(
                    J[:, :, i, j], fd, atol=5e-3,
                    err_msg=f"fwd/bwd DropEdge mask mismatch at V[{i},{j}]",
                )


class TestTileProductWiring:
    def test_attach_kernel_permutes_edges(self):
        from grl_tpu.ops.kernels import attach_kernel

        send, recv, rel, w, N, L = clustered_graph(seed=11)
        graph = to_graph(send, recv, rel, w, N, L)
        adj = attach_kernel(
            graph, impl="tile", tile_size=64, tile_min_edges=40,
        )
        perm = adj.kernel.node_perm
        assert perm is not None
        np.testing.assert_array_equal(np.asarray(adj.senders), perm[send])
        np.testing.assert_array_equal(np.asarray(adj.receivers), perm[recv])

    def test_full_graph_procedure_trains(self):
        """kernel_impl="tile" end-to-end through FullGraphProcedure on a
        clustered SBM: features/labels are scattered through node_perm
        and the model still learns (val accuracy >> chance)."""
        import tempfile

        from grl_tpu.config import ConfigDict
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures.full_graph_procedure import (
            FullGraphProcedure,
        )

        data = sbm_relational_graph(
            num_nodes=1500, num_classes=5, num_relations=1, avg_degree=8,
            feature_dim=16, communities=12, noise=4.0, seed=0,
        )
        with tempfile.TemporaryDirectory() as tmp:
            config = ConfigDict(
                {
                    "experiment_name": "tile_e2e",
                    "seed": 0,
                    "output_dir": tmp,
                    "num_epochs": 60,
                    "scan_steps": 5,
                    "max_grad_norm": 5.0,
                    "kernel_plan": {"tile_size": 64, "tile_min_edges": 40},
                    "optimizer": {
                        "type": "BuiltinOptimizer",
                        "args": {"type_optimizer": "Adam", "lr": 1e-2},
                    },
                    "logging": {"use_tensorboard": False},
                }
            )
            # Dropouts off: this test pins the PERMUTATION WIRING
            # (scattered features/labels vs relabeled edges) — with them
            # on, convergence on this small noisy task needs ~200 epochs
            # on any kernel and the signal drowns. The stochastic paths
            # are covered by the mean-preservation and Jacobian tests.
            model = GraphCNNDropEdge(
                input_dim=16, output_dim=5, num_edges=1, net_size=32,
                use_attention=False, kernel_impl="tile",
                dropout_rate=0.0, edge_dropout_rate=0.0,
            )
            proc = FullGraphProcedure(model, config, data)
            assert proc.graph.kernel.tiles_total > 0
            acc = proc()
        assert acc > 0.6, f"tile-kernel training failed to learn: {acc}"


class TestTileProjected:
    """plan_projected tile kernel: sum_r A_r (V W_r) equals
    aggregate-then-project exactly — including DropEdge masks (the
    endpoint-pair PRF sees identical coordinates in both modes)."""

    @pytest.mark.parametrize("rate,seed", [(0.0, 0), (0.3, 7)])
    def test_matches_standard(self, rate, seed):
        send, recv, rel, w, N, L = clustered_graph(seed=0, E=9000)
        F, C = 24, 8
        rng = np.random.RandomState(1)
        V = rng.randn(N, F).astype(np.float32)
        Wr = jnp.asarray(rng.randn(L, F, C).astype(np.float32))
        kern = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40, reorder="lpa",
            plan_projected=True,
        )
        assert kern.tiles_total > 0 and kern.tables.proj is not None
        Vp = np.zeros_like(V)
        Vp[kern.node_perm] = V
        agg = np.asarray(
            kern.neighbor_aggregate(jnp.asarray(Vp), seed=seed, rate=rate)
        )
        ref = sum(
            agg[:, r * F:(r + 1) * F] @ np.asarray(Wr[r]) for r in range(L)
        )
        Vr = jnp.einsum("nf,lfc->nlc", jnp.asarray(Vp), Wr).reshape(N * L, C)
        out = np.asarray(
            kern.neighbor_aggregate_projected(Vr, seed=seed, rate=rate)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_gradients_match(self):
        send, recv, rel, w, N, L = clustered_graph(seed=0, E=9000)
        F, C = 16, 8
        rng = np.random.RandomState(2)
        Vp = rng.randn(N, F).astype(np.float32)
        Wr = jnp.asarray(rng.randn(L, F, C).astype(np.float32))
        kern = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40, reorder="none",
            plan_projected=True,
        )

        def loss_std(v):
            a = kern.neighbor_aggregate(v)
            return sum(
                (a[:, r * F:(r + 1) * F] @ Wr[r]).sum() for r in range(L)
            )

        def loss_proj(v):
            vr = jnp.einsum("nf,lfc->nlc", v, Wr).reshape(N * L, C)
            return kern.neighbor_aggregate_projected(vr).sum()

        g1 = np.asarray(jax.grad(loss_std)(jnp.asarray(Vp)))
        g2 = np.asarray(jax.grad(loss_proj)(jnp.asarray(Vp)))
        np.testing.assert_allclose(g2, g1, rtol=1e-3, atol=1e-3)

    def test_unplanned_raises(self):
        send, recv, rel, w, N, L = clustered_graph(seed=0, E=4000)
        kern = TileGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            tile_size=64, tile_min_edges=40,
        )
        with pytest.raises(ValueError, match="plan_projected"):
            kern.neighbor_aggregate_projected(jnp.zeros((N * L, 4)))
