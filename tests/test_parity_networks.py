"""End-to-end weight-copy parity for the attention/geometry/SSL networks.

Round 2 proved GATV2/DGCNN/SSLGCN/DGI at the layer level only
(tests/test_model_zoo.py); these tests close the network-level gap the
same way test_parity_zoo.py does for the GCN family: reference torch
weights are copied into grl_tpu variables and eval-mode outputs asserted
allclose. References: gnn/models/networks/gatv2.py:385-428,
dgcnn.py:67-149, sll_gcn.py:8-144, dgi.py:5-58.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_loader import import_reference_module
from tests.test_parity_reference import (
    atten_params,
    drop_edge_variables,
    graphconv_params,
    linear_params,
    rand_inputs,
    t2j,
)

gat_ref = import_reference_module("gnn.models.networks.gatv2")
dgcnn_ref = import_reference_module("gnn.models.networks.dgcnn")
ssl_ref = import_reference_module("gnn.models.networks.sll_gcn")
dgi_ref = import_reference_module("gnn.models.networks.dgi")


# ---------------------------------------------------------------------------
# GATV2 (reference: gatv2.py:385-428)
# ---------------------------------------------------------------------------
def norm_params(t_norm) -> dict:
    """reference Norm (LayerNorm variant, gatv2.py:16-33) -> flax."""
    return {
        "norm": {"scale": t2j(t_norm.norm.weight), "bias": t2j(t_norm.norm.bias)}
    }


def gat_v1_params(t, no_A: int) -> dict:
    p = {}
    for l in range(no_A + 1):
        p[f"W_{l}"] = t2j(t.W[l].parameter)
        p[f"a_{l}"] = t2j(t.A[l].parameter)
        p[f"norm_{l}"] = norm_params(t.norm[l])
    p["squeeze"] = linear_params(t.squeeze)
    if isinstance(t.map, torch.nn.Linear):
        p["map"] = linear_params(t.map)
    return p


def gat_v2_params(t, no_A: int) -> dict:
    p = {}
    for l in range(no_A + 1):
        p[f"W_src_{l}"] = t2j(t.W_src[l].parameter)
        p[f"W_dst_{l}"] = t2j(t.W_dst[l].parameter)
        p[f"a_{l}"] = t2j(t.A[l].parameter)
        p[f"norm_{l}"] = norm_params(t.norm[l])
    p["squeeze"] = linear_params(t.squeeze)
    if isinstance(t.map, torch.nn.Linear):
        p["map"] = linear_params(t.map)
    return p


class TestGATV2Network:
    @pytest.mark.parametrize("use_v2", [True, False])
    def test_eval_forward(self, use_v2):
        from grl_tpu.models import GATV2

        F_in, L, C, out_feat = 24, 3, 11, 32
        V, A = rand_inputs(B=2, N=10, L=L, F_in=F_in, seed=31, density=0.3)
        layer_cls = (
            gat_ref.GraphAttentionLayerV2 if use_v2 else gat_ref.GraphAttentionLayer
        )
        tm = gat_ref.GATV2(
            F_in, no_A=L, output_feature=out_feat, class_=C,
            GraphAttentionLayer=layer_cls,
        )
        tm.eval()
        with torch.no_grad():
            out_t = tm([torch.from_numpy(V), torch.from_numpy(A)]).numpy()

        layer_params = gat_v2_params if use_v2 else gat_v1_params
        dense_gat = tm.fullflow[1]
        params = {
            "gat_in": layer_params(tm.fullflow[0], L),
            "dense_gat": {
                "layer_0": layer_params(dense_gat.layers[0], L),
                "layer_1": layer_params(dense_gat.layers[1], L),
                "squeeze_block": layer_params(dense_gat.squeeze_block, L),
            },
            "gat_out": layer_params(tm.fullflow[2], L),
            "mlp": linear_params(tm.mlp),
            "class_output": linear_params(tm.class_output),
        }
        model = GATV2(
            input_feature=F_in, no_A=L, output_feature=out_feat,
            num_classes=C, use_v2=use_v2,
        )
        out_j = model.apply(
            {"params": params}, (jnp.asarray(V), jnp.asarray(A)), train=False
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# DGCNN (reference: dgcnn.py:67-149)
# ---------------------------------------------------------------------------
def conv_block(seq) -> tuple:
    """reference Sequential(Conv{1,2}d 1x1 no-bias, BN, LeakyReLU) -> flax
    _ConvBlock params + batch stats."""
    conv, bn = seq[0], seq[1]
    w = t2j(conv.weight)
    kernel = w.reshape(w.shape[0], w.shape[1]).T  # 1x1 conv == Dense
    return (
        {
            "conv": {"kernel": kernel},
            "bn": {"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
        },
        {"bn": {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}},
    )


class TestDGCNNNetwork:
    def test_eval_forward(self):
        from grl_tpu.models import DGCNN

        B, N, F_in, C, kk = 2, 12, 7, 30, 5
        rng = np.random.RandomState(41)
        V = rng.randn(B, N, F_in).astype(np.float32)
        tm = dgcnn_ref.DGCNN(F_in, C, kk)
        # Non-trivial running stats so the batch_stats mapping is load-
        # bearing (fresh BN stats are the 0/1 no-op).
        with torch.no_grad():
            for bn in (tm.bn1, tm.bn2, tm.bn3, tm.bn4, tm.bn5):
                bn.running_mean.normal_(0.0, 0.2)
                bn.running_var.uniform_(0.5, 1.5)
        tm.eval()
        with torch.no_grad():
            out_t = tm((torch.from_numpy(V), None)).numpy()

        params, stats = {}, {}
        for i, seq in enumerate((tm.conv1, tm.conv2, tm.conv3, tm.conv4, tm.conv5)):
            p, s = conv_block(seq)
            params[f"conv{i + 1}"] = p
            stats[f"conv{i + 1}"] = s
        model = DGCNN(in_channels=F_in, out_channels=C, kk=kk)
        out_j = model.apply(
            {"params": params, "batch_stats": stats},
            (jnp.asarray(V), None),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SSLGCN heads (reference: sll_gcn.py:29-144)
# ---------------------------------------------------------------------------
def ssl_variables(tm) -> dict:
    params = {
        "trunk": {
            "emb1": {"linear": linear_params(tm.emb1)},
            "gcn1": graphconv_params(tm.gcn1),
            "gcn2": graphconv_params(tm.gcn2),
            "gcn3": graphconv_params(tm.gcn3),
            "emb2": {"linear": linear_params(tm.emb2)},
            "self_atten": atten_params(tm.self_atten),
        },
    }
    for task, head in tm.ssl_layers.items():
        params[f"head_{task}"] = linear_params(head)
    return {"params": params}


@pytest.fixture(scope="module")
def ssl_pair():
    F_in, C, L = 30, 8, 3
    tm = ssl_ref.SSLGCN(
        F_in, C, L, n_pairwise_distance=4, n_graph_classes=12, net_size=32
    )
    tm.eval()
    from grl_tpu.models import SSLGCN

    model = SSLGCN(
        input_dim=F_in, output_dim=C, num_edges=L,
        n_pairwise_distance=4, n_graph_classes=12, net_size=32,
    )
    return tm, model, ssl_variables(tm), (F_in, L)


class TestSSLGCNHeads:
    @pytest.mark.parametrize("task", ["node_property", "graph_classification"])
    def test_node_and_graph_heads(self, ssl_pair, task):
        tm, model, variables, (F_in, L) = ssl_pair
        V, A = rand_inputs(B=2, N=13, L=L, F_in=F_in, seed=51)
        with torch.no_grad():
            out_t = tm(
                [torch.from_numpy(V), torch.from_numpy(A)], task=task
            ).numpy()
        out_j = model.apply(
            variables, (jnp.asarray(V), jnp.asarray(A)), train=False, task=task
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize(
        "task", ["edge_mask", "pairwise_distance", "pairwise_similarity"]
    )
    def test_edge_heads(self, ssl_pair, task):
        # B=1: the reference indexes the flattened embedding with sample-
        # local edge ids (sll_gcn.py:84-86), correct only for B=1; grl_tpu
        # applies batch offsets (documented deviation), so parity is
        # asserted on the batch size where the reference is right.
        tm, model, variables, (F_in, L) = ssl_pair
        V, A = rand_inputs(B=1, N=13, L=L, F_in=F_in, seed=52)
        rng = np.random.RandomState(7)
        edges = rng.randint(0, 13, (1, 20, 2)).astype(np.int64)
        with torch.no_grad():
            out_t = tm(
                [torch.from_numpy(V), torch.from_numpy(A)],
                edges=torch.from_numpy(edges), task=task,
            ).numpy()
        out_j = model.apply(
            variables, (jnp.asarray(V), jnp.asarray(A)), train=False,
            task=task, edges=jnp.asarray(edges),
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)

    def test_graph_edit_distance_and_dgi(self, ssl_pair):
        tm, model, variables, (F_in, L) = ssl_pair
        V1, A1 = rand_inputs(B=2, N=13, L=L, F_in=F_in, seed=53)
        V2, A2 = rand_inputs(B=2, N=13, L=L, F_in=F_in, seed=54)
        t_in = [torch.from_numpy(x) for x in (V1, A1, V2, A2)]
        j_in = tuple(jnp.asarray(x) for x in (V1, A1, V2, A2))
        with torch.no_grad():
            ged_t = tm(t_in, task="graph_edit_distance").numpy()
            pos_t, neg_t = tm(t_in, task="dgi")
        ged_j = model.apply(variables, j_in, train=False, task="graph_edit_distance")
        np.testing.assert_allclose(np.asarray(ged_j), ged_t, rtol=2e-4, atol=2e-4)
        pos_j, neg_j = model.apply(variables, j_in, train=False, task="dgi")
        np.testing.assert_allclose(np.asarray(pos_j), pos_t.numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(neg_j), neg_t.numpy(), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# DGI readout + discriminator (reference: dgi.py:5-58)
# ---------------------------------------------------------------------------
class TestDGIContrastive:
    def test_forward_contrastive(self):
        from grl_tpu.models import DGI

        B, N, d = 3, 9, 16
        t_dgi = dgi_ref.DGI(encoder=torch.nn.Identity(), output_dim=d)
        t_dgi.eval()
        rng = np.random.RandomState(61)
        H_pos = rng.randn(B, N, d).astype(np.float32)
        H_neg = rng.randn(B, N, d).astype(np.float32)
        with torch.no_grad():
            out_t = t_dgi.forward_contrastive(
                torch.from_numpy(H_pos), torch.from_numpy(H_neg)
            ).numpy()

        model = DGI(encoder=None, output_dim=d)
        variables = {
            "params": {
                "discriminator": {
                    "bilinear": t2j(t_dgi.discrimator.bilinear.weight)[0],
                    "bias": t2j(t_dgi.discrimator.bilinear.bias),
                }
            }
        }
        out_j = model.apply(
            variables, jnp.asarray(H_pos), jnp.asarray(H_neg),
            method=model.forward_contrastive,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)
