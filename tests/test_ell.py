"""ELL scatter-free sparse aggregation: parity vs the COO segment-sum
path (pure XLA — runs on the CPU harness; TPU perf lives in bench.py)."""
from __future__ import annotations

import numpy as np

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
