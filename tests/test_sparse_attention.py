"""Fused sparse attention (ELL-table SDDMM+softmax+SpMM) vs the
segment-op reference path, forward and gradients."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.ops.pallas import sparse_attention
from grl_tpu.ops.pallas.sparse_attention import SparseAttentionKernel
from grl_tpu.ops.segment import segment_softmax, segment_sum


@pytest.fixture(autouse=True)
def interpret_mode():
    prev = sparse_attention.INTERPRET
    sparse_attention.INTERPRET = True
    yield
    sparse_attention.INTERPRET = prev


def segment_attend(f, g, h, senders, receivers, num_nodes):
    """The XLA segment-op reference (the SparseNodeSelfAtten math)."""
    scores = jnp.sum(f[receivers] * g[senders], axis=-1)
    alpha = segment_softmax(
        scores.astype(jnp.float32), receivers, num_nodes,
        mask=jnp.ones(len(senders), bool),
    )
    return segment_sum(h[senders] * alpha[:, None], receivers, num_nodes)


def random_problem(seed=0, N=64, E=400, K=8, F=32, hub=False):
    rng = np.random.RandomState(seed)
    senders = rng.randint(0, N, E).astype(np.int32)
    # Leave nodes N-3..N-1 isolated as receivers (zero-degree softmax).
    receivers = rng.randint(0, N - 3, E).astype(np.int32)
    if hub:
        # One receiver with degree > MAX_PALLAS_WIDTH: exercises the XLA
        # einsum fallback bucket next to Pallas buckets.
        receivers[: sparse_attention.MAX_PALLAS_WIDTH + 20] = 0
    f = rng.randn(N, K).astype(np.float32)
    g = rng.randn(N, K).astype(np.float32)
    h = rng.randn(N, F).astype(np.float32)
    return senders, receivers, f, g, h, N


class TestFusedForward:
    @pytest.mark.parametrize("hub", [False, True])
    def test_matches_segment_path(self, hub):
        senders, receivers, f, g, h, N = random_problem(hub=hub)
        kern = SparseAttentionKernel(senders, receivers, num_nodes=N)
        out = np.asarray(kern.attend(jnp.asarray(f), jnp.asarray(g), jnp.asarray(h)))
        expected = np.asarray(
            segment_attend(
                jnp.asarray(f), jnp.asarray(g), jnp.asarray(h),
                jnp.asarray(senders), jnp.asarray(receivers), N,
            )
        )
        np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)

    def test_zero_degree_receivers_zero(self):
        senders, receivers, f, g, h, N = random_problem()
        kern = SparseAttentionKernel(senders, receivers, num_nodes=N)
        out = np.asarray(kern.attend(jnp.asarray(f), jnp.asarray(g), jnp.asarray(h)))
        np.testing.assert_array_equal(out[N - 3:], 0.0)

    def test_duplicate_edges_are_separate_slots(self):
        """Duplicate (s, r) pairs each contribute a softmax slot, exactly
        like duplicate segment entries."""
        senders = np.array([1, 1, 2], np.int32)
        receivers = np.array([0, 0, 0], np.int32)
        rng = np.random.RandomState(1)
        f, g, h = (rng.randn(3, 4).astype(np.float32) for _ in range(3))
        kern = SparseAttentionKernel(senders, receivers, num_nodes=3)
        out = np.asarray(kern.attend(*map(jnp.asarray, (f, g, h))))
        expected = np.asarray(
            segment_attend(
                *map(jnp.asarray, (f, g, h)),
                jnp.asarray(senders), jnp.asarray(receivers), 3,
            )
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


class TestFusedBackward:
    @pytest.mark.parametrize("hub", [False, True])
    def test_grads_match_segment_autodiff(self, hub):
        senders, receivers, f, g, h, N = random_problem(seed=2, hub=hub)
        kern = SparseAttentionKernel(senders, receivers, num_nodes=N)
        w = np.random.RandomState(3).randn(h.shape[1]).astype(np.float32)

        def loss_fused(f_, g_, h_):
            return jnp.sum(kern.attend(f_, g_, h_) * w)

        def loss_ref(f_, g_, h_):
            return jnp.sum(
                segment_attend(
                    f_, g_, h_, jnp.asarray(senders), jnp.asarray(receivers), N
                )
                * w
            )

        args = tuple(map(jnp.asarray, (f, g, h)))
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
        for a, b, name in zip(got, want, "fgh"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
                err_msg=f"d{name}",
            )


class TestLayerWiring:
    def test_sparse_self_atten_uses_fused_kernel(self):
        """SparseNodeSelfAtten with an attached atten_kernel equals the
        segment path, forward and grads, through the flax layer."""
        from grl_tpu.data.large_graph import sbm_relational_graph, to_relational_graph
        from grl_tpu.models.layers import SparseNodeSelfAtten
        from grl_tpu.ops.kernels import attach_kernel

        sbm = sbm_relational_graph(
            num_nodes=96, num_classes=4, num_relations=2, avg_degree=6,
            feature_dim=16, seed=5,
        )
        graph, feats = to_relational_graph(sbm)
        fused_graph = attach_kernel(graph, impl="xla", attention=True)
        assert fused_graph.atten_kernel is not None

        layer = SparseNodeSelfAtten(16)
        V = jnp.asarray(feats)
        variables = layer.init(jax.random.PRNGKey(0), V, graph)

        def run(graph_in, v):
            return layer.apply(variables, v, graph_in)

        out_seg = np.asarray(run(graph, V))
        out_fused = np.asarray(run(fused_graph, V))
        np.testing.assert_allclose(out_fused, out_seg, rtol=2e-5, atol=2e-5)

        g_seg = jax.grad(lambda v: jnp.sum(run(graph, v) ** 2))(V)
        g_fused = jax.grad(lambda v: jnp.sum(run(fused_graph, v) ** 2))(V)
        # Different (but both correct) accumulation orders through the
        # squared loss: allow a slightly looser bound than the op-level
        # parity tests above.
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_seg), rtol=5e-4, atol=5e-4
        )
