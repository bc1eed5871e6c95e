"""Mixed-precision (bfloat16 compute, float32 params) path.

The TPU throughput recipe: activations and the (B,N,L,N) adjacency are
cast to bf16 (single-pass MXU matmuls, half the HBM traffic on the
dominant operand) while parameters stay float32 master copies and the
loss/softmax run in float32. The reference has no mixed-precision path
(pure f32 torch — reference: gnn/models/networks/drop_robust_gcn.py:31-103);
these tests pin our recipe's numerics instead: bf16 forward close to f32,
params stay f32 under a train step, and the fused Pallas kernel accepts
bf16 operands with f32 accumulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from grl_tpu.models import GraphCNNDropEdge, init_model
from grl_tpu.trainer.losses import cross_entropy

B, N, L, F_IN, C = 2, 128, 6, 64, 7


def _batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    V = jax.random.normal(k1, (B, N, F_IN), jnp.float32)
    A = (jax.random.uniform(k2, (B, N, L, N)) < 0.05).astype(jnp.float32)
    y = jax.random.randint(k3, (B, N), 0, C)
    return V, A, y


class TestBF16Flagship:
    def test_eval_forward_close_to_f32(self):
        key = jax.random.PRNGKey(0)
        V, A, _ = _batch(key)
        kwargs = dict(input_dim=F_IN, output_dim=C, num_edges=L, net_size=64)
        m32 = GraphCNNDropEdge(**kwargs)
        m16 = GraphCNNDropEdge(**kwargs, compute_dtype="bfloat16")
        variables = init_model(m32, key, (V, A))
        out32 = m32.apply(variables, (V, A), train=False)
        out16 = m16.apply(variables, (V, A), train=False)
        assert out16.dtype == jnp.float32  # logits cast back for the loss
        # bf16 has ~3 significant digits and the frozen RanPAC expansion
        # amplifies logits to O(100); assert in relative norm.
        a, b = np.asarray(out32), np.asarray(out16)
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 0.05, f"relative error {rel:.4f}"

    def test_train_step_keeps_f32_params_and_reduces_loss(self):
        key = jax.random.PRNGKey(1)
        V, A, y = _batch(key)
        model = GraphCNNDropEdge(
            input_dim=F_IN, output_dim=C, num_edges=L, net_size=64,
            compute_dtype="bfloat16",
        )
        variables = init_model(model, key, (V, A))
        params, constants = variables["params"], variables["constants"]
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p, "constants": constants}, (V, A),
                    train=True, rngs={"dropout": rng},
                )
                return cross_entropy(logits, y)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        rng = jax.random.PRNGKey(2)
        losses = []
        for _ in range(20):
            rng, k = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, k)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # master params must remain float32 despite bf16 compute
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_pallas_kernel_accepts_dtype(self, dtype):
        from grl_tpu.ops.pallas import relagg
        from grl_tpu.ops.pallas.relagg import pallas_neighbor_aggregate
        from grl_tpu.ops.relconv import relational_aggregate

        prev_interpret = relagg.INTERPRET
        if jax.default_backend() == "cpu":
            relagg.INTERPRET = True
        try:
            key = jax.random.PRNGKey(3)
            V, A, _ = _batch(key)
            V, A = V.astype(dtype), A.astype(dtype)
            out = pallas_neighbor_aggregate(V, A)
            assert out.dtype == dtype
            ref = relational_aggregate(
                V.astype(jnp.float32), A.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(B, N, L + 1, -1)[:, :, 1:, :]
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref),
                rtol=0.05, atol=0.2,
            )
        finally:
            relagg.INTERPRET = prev_interpret
