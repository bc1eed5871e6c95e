"""Model zoo: forward smoke tests for every network + parity tests for the
GAT/DGCNN/deep families vs the PyTorch reference."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.models import MODEL_REGISTRY, create_model, init_model

B, N, L, FIN = 2, 21, 6, 48


def rand_inputs(seed=0, F_in=FIN, density=0.1):
    rng = np.random.RandomState(seed)
    V = jnp.asarray(rng.randn(B, N, F_in).astype(np.float32))
    A = jnp.asarray((rng.rand(B, N, L, N) < density).astype(np.float32))
    return V, A


MODEL_SPECS = {
    "GraphCNNDropEdge": dict(input_dim=FIN, output_dim=7, num_edges=L, net_size=32),
    "RobustGCN": dict(input_dim=FIN, output_dim=7, num_edges=L, net_size=32),
    "RPGraphCNNDropEdge": dict(
        input_dim=FIN, output_dim=7, num_edges=L, net_size=32, rp_size=64
    ),
    "ModGCN": dict(input_dim=FIN, output_dim=7, num_edges=L, net_size=32),
    "DeepRPGCN": dict(
        input_dim=FIN, output_dim=7, num_edges=L, net_size=16, num_layers=5
    ),
    "DeepRPRobustGCN": dict(input_dim=FIN, output_dim=7, num_edges=L, net_size=16),
    "GATV2": dict(input_feature=FIN, no_A=L, output_feature=16, num_classes=7),
    "DGCNN": dict(in_channels=FIN, out_channels=7, kk=5),
    "SSLGCN": dict(input_dim=FIN, output_dim=7, num_edges=L, net_size=32),
}


class TestForwardSmoke:
    @pytest.mark.parametrize("name", sorted(MODEL_SPECS))
    def test_eval_and_train_forward(self, name):
        model = create_model(name, **MODEL_SPECS[name])
        V, A = rand_inputs()
        variables = init_model(model, jax.random.PRNGKey(0), (V, A))
        out = model.apply(variables, (V, A), train=False)
        assert out.shape == (B, N, 7), (name, out.shape)
        assert np.isfinite(np.asarray(out)).all(), name
        # Train mode with dropout + batch stats mutation.
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out_t = model.apply(
            variables,
            (V, A),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=mutable,
        )
        if mutable:
            out_t = out_t[0]
        assert out_t.shape == (B, N, 7), name

    def test_registry_covers_reference_exports(self):
        """Every network exported by the reference exists here
        (reference: gnn/models/__init__.py:1-8 + internal models)."""
        for name in (
            "GraphCNNDropEdge",
            "RobustGCN",
            "RPGraphCNNDropEdge",
            "DeepRPGCN",
            "DeepRPRobustGCN",
            "GATV2",
            "DGCNN",
            "SSLGCN",
            "DGI",
            "ModGCN",
        ):
            assert name in MODEL_REGISTRY, name


class TestSSLTasks:
    def test_all_ssl_task_outputs(self):
        from grl_tpu.models import SSLGCN

        model = SSLGCN(input_dim=FIN, output_dim=7, num_edges=L, net_size=32,
                       n_pairwise_distance=4, n_graph_classes=11)
        V, A = rand_inputs()
        variables = init_model(model, jax.random.PRNGKey(0), (V, A))
        rngs = {"dropout": jax.random.PRNGKey(1)}

        out = model.apply(variables, (V, A), task="node_property")
        assert out.shape == (B, N, 1)

        edges = jnp.asarray(np.random.RandomState(0).randint(0, N, (B, 9, 2)))
        for task, dim in (("edge_mask", 1), ("pairwise_distance", 4),
                          ("pairwise_similarity", 1)):
            out = model.apply(variables, (V, A), task=task, edges=edges)
            assert out.shape == (B, 9, dim), task

        V2, A2 = rand_inputs(seed=5)
        out = model.apply(variables, (V, A, V2, A2), task="graph_edit_distance")
        assert out.shape == (B, 1, 1)
        out = model.apply(variables, (V, A), task="graph_classification")
        assert out.shape == (B, 1, 11)
        pos, neg = model.apply(variables, (V, A, V2, A2), task="dgi")
        assert pos.shape == neg.shape == (B, N, 16)
        logits = model.apply(variables, (V, A), train=True, rngs=rngs)
        assert logits.shape == (B, N, 7)

    def test_dgi_contrastive(self):
        from grl_tpu.models import DGI, SSLGCN

        encoder = SSLGCN(input_dim=FIN, output_dim=7, num_edges=L, net_size=32)
        from grl_tpu.models.ssl_gcn import init_dgi_variables

        model = DGI(encoder=encoder, output_dim=16)
        V, A = rand_inputs()
        variables = init_dgi_variables(model, jax.random.PRNGKey(0), V, A, emb_dim=16)
        H = model.apply(variables, V, A)  # encoder forward -> logits path
        assert H.shape == (B, N, 7)
        H_pos = jax.random.normal(jax.random.PRNGKey(3), (B, N, 16))
        H_neg = jax.random.normal(jax.random.PRNGKey(4), (B, N, 16))
        scores = model.apply(variables, H_pos, H_neg, method=model.forward_contrastive)
        assert scores.shape == (B, 2 * N)


class TestTorchParity:
    @pytest.fixture(scope="class")
    def torch_mods(self):
        torch = pytest.importorskip("torch")
        import importlib
        import sys

        from tests.reference_loader import install_reference_stubs

        install_reference_stubs()
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        gat = importlib.import_module("gnn.models.networks.gatv2")
        dgcnn = importlib.import_module("gnn.models.networks.dgcnn")
        robust = importlib.import_module("gnn.models.networks.robust_gcn")
        return torch, gat, dgcnn, robust

    def test_gat_v1_layer(self, torch_mods):
        torch, gat, _, _ = torch_mods
        from grl_tpu.models import GraphAttentionLayer

        torch.manual_seed(0)
        t_layer = gat.GraphAttentionLayer(L, FIN, 32, dropout=0.0)
        t_layer.eval()
        V, A = rand_inputs(seed=3)
        # torch layer expects adj (B, N, L, N) indexed adj[:, :, l, :].
        with torch.no_grad():
            out_t, _ = t_layer(
                torch.from_numpy(np.asarray(V)), torch.from_numpy(np.asarray(A))
            )
        params = {}
        for l in range(L + 1):
            params[f"W_{l}"] = jnp.asarray(t_layer.W[l].parameter.detach().numpy())
            params[f"a_{l}"] = jnp.asarray(t_layer.A[l].parameter.detach().numpy())
            params[f"norm_{l}"] = {
                "norm": {
                    "scale": jnp.asarray(t_layer.norm[l].norm.weight.detach().numpy()),
                    "bias": jnp.asarray(t_layer.norm[l].norm.bias.detach().numpy()),
                }
            }
        params["squeeze"] = {
            "kernel": jnp.asarray(t_layer.squeeze.weight.detach().numpy()).T,
            "bias": jnp.asarray(t_layer.squeeze.bias.detach().numpy()),
        }
        params["map"] = {
            "kernel": jnp.asarray(t_layer.map.weight.detach().numpy()).T,
            "bias": jnp.asarray(t_layer.map.bias.detach().numpy()),
        }
        layer = GraphAttentionLayer(no_A=L, features=32, dropout=0.0)
        out_j, _ = layer.apply({"params": params}, V, A, False)
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=5e-4
        )

    def test_gat_v2_layer(self, torch_mods):
        torch, gat, _, _ = torch_mods
        from grl_tpu.models import GraphAttentionLayerV2

        torch.manual_seed(0)
        t_layer = gat.GraphAttentionLayerV2(L, FIN, 32, dropout=0.0, multi_head=4, ratio=16)
        t_layer.eval()
        V, A = rand_inputs(seed=4)
        with torch.no_grad():
            out_t, _ = t_layer(
                torch.from_numpy(np.asarray(V)), torch.from_numpy(np.asarray(A))
            )
        params = {}
        for l in range(L + 1):
            params[f"W_src_{l}"] = jnp.asarray(t_layer.W_src[l].parameter.detach().numpy())
            params[f"W_dst_{l}"] = jnp.asarray(t_layer.W_dst[l].parameter.detach().numpy())
            params[f"a_{l}"] = jnp.asarray(t_layer.A[l].parameter.detach().numpy())
            params[f"norm_{l}"] = {
                "norm": {
                    "scale": jnp.asarray(t_layer.norm[l].norm.weight.detach().numpy()),
                    "bias": jnp.asarray(t_layer.norm[l].norm.bias.detach().numpy()),
                }
            }
        params["squeeze"] = {
            "kernel": jnp.asarray(t_layer.squeeze.weight.detach().numpy()).T,
            "bias": jnp.asarray(t_layer.squeeze.bias.detach().numpy()),
        }
        params["map"] = {
            "kernel": jnp.asarray(t_layer.map.weight.detach().numpy()).T,
            "bias": jnp.asarray(t_layer.map.bias.detach().numpy()),
        }
        layer = GraphAttentionLayerV2(no_A=L, features=32, dropout=0.0, multi_head=4, ratio=16)
        out_j, _ = layer.apply({"params": params}, V, A, False)
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=5e-4
        )

    def test_dgcnn_knn_features(self, torch_mods):
        torch, _, dgcnn, _ = torch_mods
        from grl_tpu.models import knn_edge_features

        rng = np.random.RandomState(0)
        x = rng.randn(B, N, 12).astype(np.float32)
        with torch.no_grad():
            # torch path takes (B, F, V)
            feat_t = dgcnn.get_graph_feature(
                torch.from_numpy(x.transpose(0, 2, 1)), K=5
            ).numpy()  # (B, 2F, V, K)
        feat_j = np.asarray(knn_edge_features(jnp.asarray(x), 5))  # (B, V, K, 2F)
        np.testing.assert_allclose(
            feat_j.transpose(0, 3, 1, 2), feat_t, rtol=1e-4, atol=1e-4
        )

    def test_rel_graph_attention(self, torch_mods):
        torch, _, _, robust = torch_mods
        from grl_tpu.models import RelGraphAttention

        torch.manual_seed(0)
        t_layer = robust.GraphAttention(FIN, 16, n_head=L, attn_dropout=0.0)
        t_layer.eval()
        V, A = rand_inputs(seed=6)
        # torch forward expects adj (B, N, N, L) and permutes to heads.
        with torch.no_grad():
            out_t = t_layer(
                torch.from_numpy(np.asarray(V)),
                torch.from_numpy(np.asarray(A)).permute(0, 1, 3, 2),
            ).numpy()
        params = {
            "w": jnp.asarray(t_layer.w.detach().numpy()),
            "a_src": jnp.asarray(t_layer.a_src.detach().numpy()),
            "a_dst": jnp.asarray(t_layer.a_dst.detach().numpy()),
            "bias": jnp.asarray(t_layer.bias.detach().numpy()),
        }
        layer = RelGraphAttention(features=16, n_head=L, attn_dropout=0.0)
        out_j = layer.apply({"params": params}, V, A, False)
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)
