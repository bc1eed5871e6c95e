"""ELL scatter-free sparse aggregation: parity vs the COO segment-sum
path (pure XLA — runs on the CPU harness; TPU perf lives in bench.py)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.ops.ell import ELLGraphKernel
from grl_tpu.ops.sparse import RelationalGraph, relational_neighbor_coo

from tests.test_csr_spmm import random_graph


def make_kernel(senders, receivers, relations, weights, N, L, **kw):
    return ELLGraphKernel(senders, receivers, relations, weights, N, L, **kw)


class TestForwardParity:
    def test_matches_coo_segment_sum(self):
        senders, receivers, relations, weights, V, graph = random_graph()
        kern = make_kernel(senders, receivers, relations, weights,
                           graph.num_nodes, graph.num_relations)
        out = kern.neighbor_aggregate(jnp.asarray(V))
        expected = relational_neighbor_coo(jnp.asarray(V), graph)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
        )

    def test_hub_nodes_hit_wide_buckets(self):
        # One node receives 500 edges; the tail has degree <= 3.
        rng = np.random.RandomState(7)
        N, L, F = 64, 2, 8
        hub_s = rng.randint(0, N, 500)
        hub_r = np.zeros(500, np.int64)
        tail_s = rng.randint(0, N, 150)
        tail_r = rng.randint(1, N, 150)
        senders = np.concatenate([hub_s, tail_s]).astype(np.int32)
        receivers = np.concatenate([hub_r, tail_r]).astype(np.int32)
        relations = rng.randint(0, L, len(senders)).astype(np.int32)
        weights = (rng.rand(len(senders)) + 0.1).astype(np.float32)
        V = rng.randn(N, F).astype(np.float32)
        graph = RelationalGraph(
            senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
            relations=jnp.asarray(relations), weights=jnp.asarray(weights),
            mask=jnp.ones(len(senders), bool), num_nodes=N, num_relations=L,
        )
        kern = make_kernel(senders, receivers, relations, weights, N, L)
        assert len(kern._fwd) > 1  # degree bucketing actually kicked in
        out = kern.neighbor_aggregate(jnp.asarray(V))
        expected = relational_neighbor_coo(jnp.asarray(V), graph)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4
        )

    def test_bf16_gather_f32_accumulate(self):
        senders, receivers, relations, weights, V, graph = random_graph(seed=2)
        kern = make_kernel(senders, receivers, relations, weights,
                           graph.num_nodes, graph.num_relations)
        out = kern.neighbor_aggregate(jnp.asarray(V, jnp.bfloat16))
        assert out.dtype == jnp.bfloat16
        expected = relational_neighbor_coo(jnp.asarray(V), graph)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(expected), rtol=0.05, atol=0.2
        )

    def test_masked_padding_edges_dropped_at_plan(self):
        senders, receivers, relations, weights, V, graph = random_graph(
            seed=8, N=100, L=2, E=600, F=8
        )
        weights = weights.copy()
        weights[::3] = 0.0  # masked / padding edges
        graph = graph.replace(weights=jnp.asarray(weights))
        kern = make_kernel(senders, receivers, relations, weights,
                           graph.num_nodes, graph.num_relations)
        out = kern.neighbor_aggregate(jnp.asarray(V))
        expected = relational_neighbor_coo(jnp.asarray(V), graph)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
        )


class TestGradients:
    def test_dv_matches_coo_grad(self):
        senders, receivers, relations, weights, V, graph = random_graph(
            seed=3, N=200, L=2, E=1200, F=8
        )
        kern = make_kernel(senders, receivers, relations, weights,
                           graph.num_nodes, graph.num_relations)

        def f_ell(v):
            return jnp.sum(kern.neighbor_aggregate(v) ** 2)

        def f_coo(v):
            return jnp.sum(relational_neighbor_coo(v, graph) ** 2)

        g_ell = jax.grad(f_ell)(jnp.asarray(V))
        g_coo = jax.grad(f_coo)(jnp.asarray(V))
        np.testing.assert_allclose(
            np.asarray(g_ell), np.asarray(g_coo), rtol=1e-4, atol=1e-4
        )


class TestFusedDropEdge:
    def test_matches_csr_hash_mask(self):
        """Same (seed, rate) must reproduce the Pallas CSR kernel's mask —
        CSRAdjacency can swap impls without changing semantics."""
        from jax.experimental.pallas import tpu as pltpu

        from grl_tpu.ops.pallas import csr_spmm

        senders, receivers, relations, weights, V, graph = random_graph(
            seed=4, N=96, L=2, E=700, F=8
        )
        ell = make_kernel(senders, receivers, relations, weights,
                          graph.num_nodes, graph.num_relations)
        prev = csr_spmm.INTERPRET
        csr_spmm.INTERPRET = True
        try:
            with pltpu.force_tpu_interpret_mode():
                csr = csr_spmm.CSRGraphKernel(
                    senders, receivers, relations, weights,
                    graph.num_nodes, graph.num_relations,
                    block_rows=128, chunk_cols=128, edge_quantum=64, unroll=4,
                )
                a = ell.neighbor_aggregate(jnp.asarray(V), seed=11, rate=0.3)
                b = csr.neighbor_aggregate(jnp.asarray(V), seed=11, rate=0.3)
        finally:
            csr_spmm.INTERPRET = prev
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )

    def test_backward_mask_consistent_with_forward(self):
        """<grad sum(y), V> == sum(y) for the linear masked op — fails if
        the backward tables regenerate a different hash mask."""
        senders, receivers, relations, weights, V, graph = random_graph(
            seed=5, N=160, L=3, E=900, F=8
        )
        kern = make_kernel(senders, receivers, relations, weights,
                           graph.num_nodes, graph.num_relations)
        Vj = jnp.asarray(V)

        def f(v):
            return jnp.sum(kern.neighbor_aggregate(v, seed=11, rate=0.3))

        y = float(f(Vj))
        dV = jax.grad(f)(Vj)
        np.testing.assert_allclose(float(jnp.vdot(dV, Vj)), y, rtol=1e-4)

    def test_traced_seed_under_jit(self):
        senders, receivers, relations, weights, V, graph = random_graph(
            seed=6, N=80, L=2, E=400, F=8
        )
        kern = make_kernel(senders, receivers, relations, weights,
                           graph.num_nodes, graph.num_relations)
        Vj = jnp.asarray(V)

        @jax.jit
        def run(v, seed):
            return kern.neighbor_aggregate(v, seed=seed, rate=0.3)

        a = run(Vj, jnp.int32(3))
        b = kern.neighbor_aggregate(Vj, seed=3, rate=0.3)
        # jit and eager fuse the unrolled gather-fma chain differently;
        # only float reassociation noise is allowed here.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
        c = run(Vj, jnp.int32(4))
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestProjectedAggregation:
    """Project-first mode (ell_aggregate_projected): sum_r A_r (V W_r)
    must equal aggregate-then-project exactly, including DropEdge masks
    (same per-edge gids drive the hash in both table sets)."""

    def _kernel(self, plan_projected=True, **kw):
        import numpy as np

        from grl_tpu.ops.ell import ELLGraphKernel

        rng = np.random.RandomState(0)
        N, L, E = 300, 3, 2500
        send, recv = rng.randint(0, N, E), rng.randint(0, N, E)
        rel = rng.randint(0, L, E)
        w = rng.rand(E).astype(np.float32) + 0.5
        kern = ELLGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=L,
            plan_projected=plan_projected, **kw,
        )
        return kern, N, L

    @pytest.mark.parametrize("rate,seed", [(0.0, 0), (0.3, 9)])
    def test_matches_standard_path(self, rate, seed):
        kern, N, L = self._kernel(width_quantum=2, bucket_growth=1)
        F, C = 24, 8
        rng = np.random.RandomState(1)
        V = jnp.asarray(rng.randn(N, F).astype(np.float32))
        Wr = jnp.asarray(rng.randn(L, F, C).astype(np.float32))
        agg = np.asarray(kern.neighbor_aggregate(V, seed=seed, rate=rate))
        ref = sum(
            agg[:, r * F:(r + 1) * F] @ np.asarray(Wr[r]) for r in range(L)
        )
        Vr = jnp.einsum("nf,lfc->nlc", V, Wr).reshape(N * L, C)
        out = np.asarray(
            kern.neighbor_aggregate_projected(Vr, seed=seed, rate=rate)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_gradients_match(self):
        kern, N, L = self._kernel()
        F, C = 16, 8
        rng = np.random.RandomState(2)
        V = jnp.asarray(rng.randn(N, F).astype(np.float32))
        Wr = jnp.asarray(rng.randn(L, F, C).astype(np.float32))

        def loss_std(v):
            a = kern.neighbor_aggregate(v)
            return sum(
                (a[:, r * F:(r + 1) * F] @ Wr[r]).sum() for r in range(L)
            )

        def loss_proj(v):
            vr = jnp.einsum("nf,lfc->nlc", v, Wr).reshape(N * L, C)
            return kern.neighbor_aggregate_projected(vr).sum()

        g1 = np.asarray(jax.grad(loss_std)(V))
        g2 = np.asarray(jax.grad(loss_proj)(V))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-4)

    def test_unplanned_raises(self):
        kern, N, L = self._kernel(plan_projected=False)
        Vr = jnp.zeros((N * L, 4))
        with pytest.raises(ValueError, match="plan_projected"):
            kern.neighbor_aggregate_projected(Vr)

    def test_graphconv_routes_project_first(self):
        """GraphConv uses the projected tables when the conv REDUCES
        width (F > C), matching the standard path numerically."""
        import tempfile

        from grl_tpu.config import ConfigDict
        from grl_tpu.data.large_graph import sbm_relational_graph
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures.full_graph_procedure import (
            FullGraphProcedure,
        )

        data = sbm_relational_graph(
            num_nodes=800, num_classes=5, num_relations=2, avg_degree=8,
            feature_dim=16, seed=4,
        )
        accs = []
        for plan in ({}, {"plan_projected": True, "width_quantum": 2,
                          "bucket_growth": 1}):
            with tempfile.TemporaryDirectory() as tmp:
                config = ConfigDict({
                    "experiment_name": "proj", "seed": 0, "output_dir": tmp,
                    "num_epochs": 60, "scan_steps": 5, "max_grad_norm": 5.0,
                    "kernel_plan": plan,
                    "optimizer": {"type": "BuiltinOptimizer",
                                  "args": {"type_optimizer": "Adam",
                                           "lr": 1e-2}},
                    "logging": {"use_tensorboard": False},
                })
                model = GraphCNNDropEdge(
                    input_dim=16, output_dim=5, num_edges=2, net_size=32,
                    use_attention=False, kernel_impl="ell",
                    dropout_rate=0.0, edge_dropout_rate=0.0,
                )
                proc = FullGraphProcedure(model, config, data)
                accs.append(proc())
        # identical data/seed/deterministic model: the projected plan is
        # the same math, so training lands at the same accuracy
        np.testing.assert_allclose(accs[1], accs[0], atol=0.02)
        assert accs[1] > 0.5


class TestDegreeReorder:
    """reorder="degree": in-degree-bucket node order makes the forward
    (and projected-forward) stitch permutations trivial — they are
    dropped from the tables (inv=None) — while numerics match the
    natural-order kernel exactly through the node_perm contract."""

    def test_trivial_stitch_and_parity(self):
        rng = np.random.RandomState(0)
        N, E, F = 900, 7000, 12
        send, recv = rng.randint(0, N, E), rng.randint(0, N, E)
        rel = np.zeros(E, np.int64)
        w = rng.rand(E).astype(np.float32) + 0.5
        V = rng.randn(N, F).astype(np.float32)

        from grl_tpu.ops.sparse import RelationalGraph, relational_neighbor_coo

        graph = RelationalGraph(
            senders=jnp.asarray(send.astype(np.int32)),
            receivers=jnp.asarray(recv.astype(np.int32)),
            relations=jnp.asarray(rel.astype(np.int32)),
            weights=jnp.asarray(w), mask=jnp.ones(E, bool),
            num_nodes=N, num_relations=1,
        )
        ref = np.asarray(relational_neighbor_coo(jnp.asarray(V), graph))
        g_ref = np.asarray(
            jax.grad(
                lambda v: (relational_neighbor_coo(v, graph) ** 2).sum()
            )(jnp.asarray(V))
        )

        kern = ELLGraphKernel(
            send, recv, rel, w, num_nodes=N, num_relations=1,
            reorder="degree", plan_projected=True,
            width_quantum=2, bucket_growth=1,
        )
        assert kern.node_perm is not None
        assert kern.tables.fwd_inv is None
        assert kern.tables.proj.fwd_inv is None
        Vp = np.zeros_like(V)
        Vp[kern.node_perm] = V
        out = np.asarray(kern.neighbor_aggregate(jnp.asarray(Vp)))
        np.testing.assert_allclose(out[kern.node_perm], ref, rtol=1e-4, atol=1e-4)
        gk = np.asarray(
            jax.grad(lambda v: (kern.neighbor_aggregate(v) ** 2).sum())(
                jnp.asarray(Vp)
            )
        )
        np.testing.assert_allclose(
            gk[kern.node_perm], g_ref, rtol=1e-3, atol=1e-3
        )

    def test_multi_relation_noop(self):
        # L>1 out rows interleave relations: no node order can
        # bucket-sort them, so the reorder is skipped (perm None).
        rng = np.random.RandomState(1)
        kern = ELLGraphKernel(
            rng.randint(0, 50, 300), rng.randint(0, 50, 300),
            rng.randint(0, 3, 300), np.ones(300, np.float32),
            num_nodes=50, num_relations=3, reorder="degree",
        )
        assert kern.node_perm is None
