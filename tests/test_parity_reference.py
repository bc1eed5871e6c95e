"""Per-layer and end-to-end numerical parity vs the PyTorch reference.

The north-star gate (BASELINE.md config 1): grl_tpu activations must match
the reference GraphCNNDropEdge / RobustGCN (reference:
gnn/models/networks/drop_robust_gcn.py:31-103, robust_gcn.py:14-231) in
eval mode after copying weights, to float32 tolerance.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from grl_tpu.models import GraphCNNDropEdge, NodeSelfAtten, RobustGCN, init_model
from grl_tpu.ops.relconv import preprocess_adjacency, relational_aggregate

from tests.reference_loader import import_reference_models

robust_ref, drop_ref = import_reference_models()


def rand_inputs(B=2, N=23, L=6, F_in=64, seed=0, density=0.08):
    rng = np.random.RandomState(seed)
    V = rng.randn(B, N, F_in).astype(np.float32)
    A = (rng.rand(B, N, L, N) < density).astype(np.float32)
    return V, A


def t2j(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy())


def linear_params(seq_or_linear) -> dict:
    """torch Linear (or Sequential[Linear, ReLU]) -> flax Dense params."""
    linear = seq_or_linear[0] if isinstance(seq_or_linear, torch.nn.Sequential) else seq_or_linear
    out = {"kernel": t2j(linear.weight).T}
    if linear.bias is not None:
        out["bias"] = t2j(linear.bias)
    return out


def graphconv_params(gc) -> dict:
    return {"h_weights": t2j(gc.h_weights), "bias": t2j(gc.bias)}


def atten_params(sa) -> dict:
    return {
        "f": {"linear": linear_params(sa.f)},
        "g": {"linear": linear_params(sa.g)},
        "h": {"linear": linear_params(sa.h)},
        "gamma": t2j(sa.gamma),
    }


class TestGraphConvOp:
    def test_aggregation_matches_preprocess_matmul(self):
        """relational_aggregate == reference preprocess_adj + matmul layout."""
        V, A = rand_inputs()
        Vj, Aj = jnp.asarray(V), jnp.asarray(A)
        agg_fast = relational_aggregate(Vj, Aj)
        A_pre = preprocess_adjacency(Aj)
        agg_ref = jnp.matmul(A_pre, Vj, precision=jax.lax.Precision.HIGHEST)
        B, N, F = V.shape
        L1 = A.shape[2] + 1
        agg_ref = agg_ref.reshape(B, N, L1 * F)
        np.testing.assert_allclose(agg_fast, agg_ref, rtol=1e-5, atol=1e-5)

    def test_graphconv_matches_torch(self):
        V, A = rand_inputs()
        L, C, F = A.shape[2], 48, V.shape[-1]
        torch_gc = robust_ref.GraphConv(F, C, L)
        with torch.no_grad():
            # Torch path expects permuted (B, N, N, L) adjacency.
            A_t = torch.from_numpy(A).permute(0, 1, 3, 2).permute(0, 1, 3, 2)
            # dataset layout (B,N,L,N) -> reference forward layout (B,N,N,L)
            A_perm = torch.from_numpy(A).permute(0, 1, 3, 2)
            out_t = torch_gc(torch.from_numpy(V), A_perm, preprocess_A=True).numpy()
            del A_t

        from grl_tpu.models import GraphConv as JGraphConv

        model = JGraphConv(C, L)
        variables = {"params": graphconv_params(torch_gc)}
        out_j = model.apply(variables, jnp.asarray(V), jnp.asarray(A))
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)

    def test_self_attention_matches_torch(self):
        V, _ = rand_inputs(F_in=128)
        torch_sa = robust_ref.NodeSelfAtten(128)
        with torch.no_grad():
            out_t = torch_sa(torch.from_numpy(V)).numpy()
        model = NodeSelfAtten(128)
        out_j = model.apply({"params": atten_params(torch_sa)}, jnp.asarray(V))
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)


def drop_edge_variables(torch_model, jax_variables):
    """Map reference GraphCNNDropEdge state into grl_tpu variables."""
    params = {
        "trunk": {
            "emb1": {"linear": linear_params(torch_model.emb1)},
            "gcn1": graphconv_params(torch_model.gcn1),
            "gcn2": graphconv_params(torch_model.gcn2),
            "gcn3": graphconv_params(torch_model.gcn3),
            "emb2": {"linear": linear_params(torch_model.emb2)},
            "self_atten": atten_params(torch_model.self_atten),
        },
        "classifier": linear_params(torch_model.classifier),
    }
    constants = {"w_rand": {"kernel": t2j(torch_model.w_rand.projection.weight).T}}
    return {"params": params, "constants": constants}


def robust_variables(torch_model):
    params = {
        "trunk": {
            "emb1": {"linear": linear_params(torch_model.emb1)},
            "gcn1": graphconv_params(torch_model.gcn1),
            "gcn2": graphconv_params(torch_model.gcn2),
            "gcn3": graphconv_params(torch_model.gcn3),
            "emb2": {"linear": linear_params(torch_model.emb2)},
            "self_atten": atten_params(torch_model.self_atten),
        },
        "gcn4": graphconv_params(torch_model.gcn4),
        "gcn5": graphconv_params(torch_model.gcn5),
        "classifier": linear_params(torch_model.classifier),
    }
    return {"params": params}


class TestNetworkParity:
    def test_graphcnn_dropedge_eval_forward(self):
        """End-to-end eval parity on the flagship model (both efficient modes)."""
        F_in, C, L = 100, 53, 6
        V, A = rand_inputs(B=2, N=31, L=L, F_in=F_in, seed=3)
        torch_model = drop_ref.GraphCNNDropEdge(F_in, C, L, net_size=64)
        torch_model.eval()
        with torch.no_grad():
            A_perm_in = torch.from_numpy(A).permute(0, 1, 3, 2)
            # reference forward itself permutes (0,1,3,2): feed (B,N,N,L)->no.
            # Reference expects dataset layout (B, N, L, N) and permutes
            # internally (drop_robust_gcn.py:63), so pass dataset layout.
            out_t = torch_model([torch.from_numpy(V), torch.from_numpy(A)]).numpy()
            out_t2 = torch_model(
                [torch.from_numpy(V), torch.from_numpy(A)], efficient_mode=False
            ).numpy()
            del A_perm_in
        np.testing.assert_allclose(out_t, out_t2, rtol=1e-4, atol=1e-5)

        model = GraphCNNDropEdge(input_dim=F_in, output_dim=C, num_edges=L, net_size=64)
        variables = init_model(model, jax.random.PRNGKey(0), (jnp.asarray(V), jnp.asarray(A)))
        variables = drop_edge_variables(torch_model, variables)
        out_j = model.apply(variables, (jnp.asarray(V), jnp.asarray(A)), train=False)
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)

    def test_robust_gcn_eval_forward(self):
        F_in, C, L = 80, 40, 6
        V, A = rand_inputs(B=2, N=27, L=L, F_in=F_in, seed=7)
        torch_model = robust_ref.RobustGCN(F_in, C, L, net_size=64)
        torch_model.eval()
        with torch.no_grad():
            out_t = torch_model([torch.from_numpy(V), torch.from_numpy(A)]).numpy()

        model = RobustGCN(input_dim=F_in, output_dim=C, num_edges=L, net_size=64)
        variables = robust_variables(torch_model)
        out_j = model.apply(variables, (jnp.asarray(V), jnp.asarray(A)), train=False)
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)

    def test_dropedge_train_mean_preserving(self):
        """DropEdge keeps aggregation unbiased: E[dropped agg] == agg."""
        from grl_tpu.ops.relconv import drop_edge

        V, A = rand_inputs(B=1, N=16, seed=11)
        Vj, Aj = jnp.asarray(V), jnp.asarray(A)
        base = relational_aggregate(Vj, Aj)
        acc = jnp.zeros_like(base)
        n_draws = 400
        for i in range(n_draws):
            Ad, ss = drop_edge(jax.random.PRNGKey(i), Aj, 0.3)
            acc = acc + relational_aggregate(Vj, Ad, ss)
        mean = acc / n_draws
        err = float(jnp.abs(mean - base).max() / (jnp.abs(base).max() + 1e-6))
        assert err < 0.15, f"DropEdge biased: rel err {err}"
