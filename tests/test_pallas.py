"""Pallas kernel tests (interpreter mode on the CPU harness; the real-TPU
run happens in bench.py / the verify recipe)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from grl_tpu.ops.pallas import relagg
from grl_tpu.ops.relconv import relational_aggregate


@pytest.fixture(autouse=True)
def interpret_mode():
    # Plain kernels run with interpret=True; the PRNG (DropEdge) kernels
    # additionally need the TPU-semantics interpreter for prng_seed.
    relagg.INTERPRET = True
    with pltpu.force_tpu_interpret_mode():
        yield
    relagg.INTERPRET = False


def rand(seed=0, B=2, N=128, L=3, F=128):
    rng = np.random.RandomState(seed)
    V = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
    A = jnp.asarray((rng.rand(B, N, L, N) < 0.05).astype(np.float32))
    return V, A


class TestNeighborAggregate:
    def test_matches_xla_path(self):
        V, A = rand()
        out = relagg.pallas_neighbor_aggregate(V, A)
        B, N, L, _ = A.shape
        expected = relational_aggregate(V, A)[:, :, V.shape[-1]:]  # drop self
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, N, -1), np.asarray(expected),
            rtol=1e-5, atol=1e-5,
        )

    def test_gradients_match_xla(self):
        V, A = rand(seed=1, N=128)

        def f_pallas(v):
            return jnp.sum(relagg.pallas_neighbor_aggregate(v, A) ** 2)

        def f_xla(v):
            F = v.shape[-1]
            agg = relational_aggregate(v, A)[:, :, F:]
            B, N = v.shape[:2]
            return jnp.sum(agg.reshape(B, N, A.shape[2], F) ** 2)

        g_pallas = jax.grad(f_pallas)(V)
        g_xla = jax.grad(f_xla)(V)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-4
        )


class TestDropEdgeAggregate:
    def test_statistics_and_sparsity_pattern(self):
        V, A = rand(seed=2, B=1, N=128, L=2)
        outs = []
        for seed in range(16):
            out = relagg.pallas_dropedge_aggregate(V, A, jnp.int32(seed), 0.3)
            outs.append(np.asarray(out))
        mean = np.mean(outs, axis=0)
        expected = np.asarray(relational_aggregate(V, A))[:, :, V.shape[-1]:]
        expected = expected.reshape(mean.shape)
        # Unbiasedness: E[dropped agg] == agg (loose tol, 16 draws).
        denom = np.abs(expected).max() + 1e-6
        assert np.abs(mean - expected).max() / denom < 0.5
        # Determinism: same seed -> same output.
        again = np.asarray(
            relagg.pallas_dropedge_aggregate(V, A, jnp.int32(3), 0.3)
        )
        np.testing.assert_array_equal(again, outs[3])

    def test_backward_mask_consistent_with_forward(self):
        """For linear y = M(mask) V: <grad_V sum(y), V> must equal sum(y)
        exactly — fails if the backward kernel regenerates a different
        mask than the forward."""
        V, A = rand(seed=3, B=1, N=128, L=2)
        seed = jnp.int32(7)

        def f(v):
            return jnp.sum(relagg.pallas_dropedge_aggregate(v, A, seed, 0.3))

        y = f(V)
        dV = jax.grad(f)(V)
        np.testing.assert_allclose(
            float(jnp.vdot(dV, V)), float(y), rtol=1e-4
        )

    def test_zero_rate_equals_plain(self):
        V, A = rand(seed=4, B=1, N=128, L=2)
        dropped = relagg.pallas_dropedge_aggregate(V, A, jnp.int32(0), 0.0)
        plain = relagg.pallas_neighbor_aggregate(V, A)
        np.testing.assert_allclose(
            np.asarray(dropped), np.asarray(plain), rtol=1e-6, atol=1e-6
        )


class TestModelIntegration:
    def test_graphcnn_pallas_matches_xla_eval(self):
        from grl_tpu.models import GraphCNNDropEdge, init_model

        V, A = rand(seed=5, B=2, N=128, L=6, F=64)
        xla_model = GraphCNNDropEdge(
            input_dim=64, output_dim=7, num_edges=6, net_size=32, kernel_impl="xla"
        )
        variables = init_model(xla_model, jax.random.PRNGKey(0), (V, A))
        pallas_model = GraphCNNDropEdge(
            input_dim=64, output_dim=7, num_edges=6, net_size=32, kernel_impl="pallas"
        )
        out_x = xla_model.apply(variables, (V, A), train=False)
        out_p = pallas_model.apply(variables, (V, A), train=False)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
        )
