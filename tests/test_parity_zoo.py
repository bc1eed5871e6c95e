"""Weight-copy torch parity for the rest of the model zoo.

Round 1 gated only the flagship + RobustGCN on activations parity
(tests/test_parity_reference.py); these tests extend the same gate to
RPGraphCNNDropEdge (reference: gnn/models/networks/rp_robust_gcn.py:29-115),
DeepRPGCN (deep_rp_gcn.py:71-150), DeepRPRobustGCN
(deep_rp_robust_gcn.py:66-168), ModGCN (mod_gcn.py:11-98) and the six
CosineLinear heads (gnn/models/modules/modified_linear.py:9-187):
reference torch weights are copied into grl_tpu variables and eval-mode
outputs asserted allclose.
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
    graphconv_params,
    linear_params,
    rand_inputs,
    t2j,
)

rp_ref = import_reference_module("gnn.models.networks.rp_robust_gcn")
deep_ref = import_reference_module("gnn.models.networks.deep_rp_gcn")
deep_robust_ref = import_reference_module("gnn.models.networks.deep_rp_robust_gcn")
mod_ref = import_reference_module("gnn.models.networks.mod_gcn")
modlin_ref = import_reference_module("gnn.models.modules.modified_linear")


def bn_params(bn) -> dict:
    return {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}


def bn_stats(bn) -> dict:
    return {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}


def emb_block(teb):
    return (
        {"emb": linear_params(teb.emb), "norm": {"bn": bn_params(teb.bn)}},
        {"norm": {"bn": bn_stats(teb.bn)}},
    )


def gcn_block(tgb):
    return (
        {"gcn": graphconv_params(tgb.gcn), "norm": {"bn": bn_params(tgb.bn)}},
        {"norm": {"bn": bn_stats(tgb.bn)}},
    )


def trunk_params(tm) -> dict:
    return {
        "emb1": {"linear": linear_params(tm.emb1)},
        "gcn1": graphconv_params(tm.gcn1),
        "gcn2": graphconv_params(tm.gcn2),
        "gcn3": graphconv_params(tm.gcn3),
        "emb2": {"linear": linear_params(tm.emb2)},
    }


class TestRPGraphCNNDropEdge:
    def test_eval_forward(self):
        from grl_tpu.models import RPGraphCNNDropEdge

        F_in, C, L = 40, 9, 4
        V, A = rand_inputs(B=2, N=17, L=L, F_in=F_in, seed=21)
        tm = rp_ref.RPGraphCNNDropEdge(F_in, C, L, net_size=32, rp_size=64,
                                       lambda_value=0.05)
        tm.eval()
        with torch.no_grad():
            out_t = tm([torch.from_numpy(V), torch.from_numpy(A)]).numpy()
            out_t2 = tm([torch.from_numpy(V), torch.from_numpy(A)],
                        efficient_mode=False).numpy()
        np.testing.assert_allclose(out_t, out_t2, rtol=1e-4, atol=1e-5)

        model = RPGraphCNNDropEdge(
            input_dim=F_in, output_dim=C, num_edges=L, net_size=32, rp_size=64,
            lambda_value=0.05,
        )
        params = {
            "trunk": trunk_params(tm),
            "self_atten": atten_params(tm.self_atten),
            "classifier": linear_params(tm.classifier),
        }
        constants = {
            "rp_emb": {"kernel": t2j(tm.rp_emb.projection.weight).T},
            "rp_final": {"kernel": t2j(tm.rp_final.projection.weight).T},
        }
        out_j = model.apply(
            {"params": params, "constants": constants},
            (jnp.asarray(V), jnp.asarray(A)), train=False,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


class TestDeepRPGCN:
    def test_eval_forward(self, monkeypatch):
        from grl_tpu.models import DeepRPGCN

        # Shrink the reference's module-level 29-layer constant for a fast
        # structurally-identical stack (same skip/self-concat quirk).
        monkeypatch.setattr(deep_ref, "NUM_GCN_LAYERS", 7)
        F_in, C, L = 36, 8, 3
        V, A = rand_inputs(B=2, N=19, L=L, F_in=F_in, seed=22)
        tm = deep_ref.DeepRPGCN(F_in, C, L, net_size=16)
        tm.eval()
        with torch.no_grad():
            out_t = tm([torch.from_numpy(V), torch.from_numpy(A)]).numpy()

        model = DeepRPGCN(
            input_dim=F_in, output_dim=C, num_edges=L, net_size=16, num_layers=7
        )
        params, stats = {}, {}
        params["emb1"], stats["emb1"] = emb_block(tm.emb1)
        for idx, layer in enumerate(tm.gcn_layers.layers):
            params[f"gcn{idx}"], stats[f"gcn{idx}"] = gcn_block(layer)
        params["emb2"], stats["emb2"] = emb_block(tm.emb2)
        params["classifier"] = linear_params(tm.classifier)
        out_j = model.apply(
            {"params": params, "batch_stats": stats},
            (jnp.asarray(V), jnp.asarray(A)), train=False,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


class TestDeepRPRobustGCN:
    def test_eval_forward(self):
        from grl_tpu.models import DeepRPRobustGCN

        F_in, C, L = 30, 7, 3
        V, A = rand_inputs(B=2, N=21, L=L, F_in=F_in, seed=23)
        tm = deep_robust_ref.DeepRPRobustGCN(F_in, C, L, net_size=16,
                                             lambda_value=0.01)
        tm.eval()
        with torch.no_grad():
            out_t = tm([torch.from_numpy(V), torch.from_numpy(A)]).numpy()

        model = DeepRPRobustGCN(
            input_dim=F_in, output_dim=C, num_edges=L, net_size=16,
            lambda_value=0.01,
        )
        params, stats = {}, {}
        params["emb1"], stats["emb1"] = emb_block(tm.emb1)
        for i in range(1, 10):
            params[f"gcn{i}"], stats[f"gcn{i}"] = gcn_block(getattr(tm, f"gcn{i}"))
        params["emb2"], stats["emb2"] = emb_block(tm.emb2)
        params["self_atten"] = atten_params(tm.self_atten)
        params["classifier"] = linear_params(tm.classifier)
        constants = {
            "rp_embed2": {"kernel": t2j(tm.rp_embed2.projection.weight).T}
        }
        out_j = model.apply(
            {"params": params, "batch_stats": stats, "constants": constants},
            (jnp.asarray(V), jnp.asarray(A)), train=False,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


class TestModGCN:
    def _variables(self, tm, split=False):
        params = {
            "trunk": {
                **trunk_params(tm),
                "self_atten": atten_params(tm.self_atten),
            },
        }
        if split:
            params["classifier"] = {
                "fc1": {"weight": t2j(tm.classifier.fc1.weight)},
                "fc2": {"weight": t2j(tm.classifier.fc2.weight)},
                "sigma": t2j(tm.classifier.sigma),
            }
        else:
            params["classifier"] = {
                "weight": t2j(tm.classifier.weight),
                "sigma": t2j(tm.classifier.sigma),
            }
        return {"params": params}

    def test_eval_forward_cosine_head(self):
        from grl_tpu.models import ModGCN

        F_in, C, L = 34, 11, 4
        V, A = rand_inputs(B=2, N=18, L=L, F_in=F_in, seed=24)
        tm = mod_ref.ModGCN(F_in, C, L, net_size=32)
        tm.eval()
        with torch.no_grad():
            out_t = tm([torch.from_numpy(V), torch.from_numpy(A)]).numpy()
        model = ModGCN(input_dim=F_in, output_dim=C, num_edges=L, net_size=32)
        out_j = model.apply(
            self._variables(tm), (jnp.asarray(V), jnp.asarray(A)), train=False
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)

    def test_eval_forward_split_head_and_modes(self):
        from grl_tpu.models import ModGCN

        F_in, C_prev, C_new, L = 34, 6, 5, 4
        V, A = rand_inputs(B=2, N=18, L=L, F_in=F_in, seed=25)
        tm = mod_ref.ModGCN(F_in, C_new, L, prev_output_dim=C_prev, net_size=32)
        tm.eval()
        with torch.no_grad():
            out_t = tm([torch.from_numpy(V), torch.from_numpy(A)]).numpy()
            emb_t = tm([torch.from_numpy(V), torch.from_numpy(A)],
                       mode="node_emb").numpy()
            first_t = tm([torch.from_numpy(V), torch.from_numpy(A)],
                         mode="first_node_emb").numpy()
        model = ModGCN(
            input_dim=F_in, output_dim=C_new, num_edges=L,
            prev_output_dim=C_prev, net_size=32,
        )
        variables = self._variables(tm, split=True)
        inputs = (jnp.asarray(V), jnp.asarray(A))
        out_j = model.apply(variables, inputs, train=False)
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)
        emb_j = model.apply(variables, inputs, train=False, mode="node_emb")
        np.testing.assert_allclose(np.asarray(emb_j), emb_t, rtol=2e-4, atol=2e-4)
        first_j = model.apply(variables, inputs, train=False, mode="first_node_emb")
        np.testing.assert_allclose(np.asarray(first_j), first_t, rtol=2e-4, atol=2e-4)


class TestCosineLinearHeads:
    """All six heads vs torch on the same weights (modified_linear.py:9-187)."""

    B, F = 6, 24

    def _x(self, seed=0):
        return np.random.RandomState(seed).randn(self.B, self.F).astype(np.float32)

    def test_cosine_linear(self):
        from grl_tpu.models.cosine_linear import CosineLinear

        x = self._x()
        tm = modlin_ref.CosineLinear(self.F, 10)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x)).numpy()
            out_t2 = tm(torch.from_numpy(x), num_head=2).numpy()
        params = {"weight": t2j(tm.weight), "sigma": t2j(tm.sigma)}
        m = CosineLinear(10)
        out_j = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)
        out_j2 = m.apply({"params": params}, jnp.asarray(x), num_head=2)
        np.testing.assert_allclose(np.asarray(out_j2), out_t2, rtol=1e-5, atol=1e-5)

    def test_split_cosine_linear(self):
        from grl_tpu.models.cosine_linear import SplitCosineLinear

        # reference concatenates along dim=2 -> needs 3D activations
        x = np.random.RandomState(1).randn(2, 5, self.F).astype(np.float32)
        tm = modlin_ref.SplitCosineLinear(self.F, 4, 6)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x)).numpy()
        params = {
            "fc1": {"weight": t2j(tm.fc1.weight)},
            "fc2": {"weight": t2j(tm.fc2.weight)},
            "sigma": t2j(tm.sigma),
        }
        out_j = SplitCosineLinear(4, 6).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)

    def test_cosine_linear_bi_feat(self):
        from grl_tpu.models.cosine_linear import CosineLinearBiFeat

        x = self._x(2)
        in1 = 10
        tm = modlin_ref.CosineLinear_bi_feat(in1, self.F - in1, 7)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x)).numpy()
            out_eval = tm(torch.from_numpy(x), eval=True).numpy()
        params = {
            "weight1": t2j(tm.weight1), "weight2": t2j(tm.weight2),
            "sigma": t2j(tm.sigma),
        }
        m = CosineLinearBiFeat(in1, 7)
        out_j = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)
        out_j_eval = m.apply({"params": params}, jnp.asarray(x), eval_mode=True)
        np.testing.assert_allclose(np.asarray(out_j_eval), out_eval, rtol=1e-5, atol=1e-5)

    def test_split_cosine_linear_bi_feat(self):
        from grl_tpu.models.cosine_linear import SplitCosineLinearBiFeat

        x = self._x(3)
        in1 = 8
        tm = modlin_ref.SplitCosineLinear_bi_feat(in1, self.F - in1, 3, 4)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x)).numpy()
        params = {
            "fc1": {"weight1": t2j(tm.fc1.weight1), "weight2": t2j(tm.fc1.weight2)},
            "fc2": {"weight1": t2j(tm.fc2.weight1), "weight2": t2j(tm.fc2.weight2)},
            "sigma": t2j(tm.sigma),
        }
        out_j = SplitCosineLinearBiFeat(in1, 3, 4).apply(
            {"params": params}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)

    def test_group_cosine_linear(self):
        from grl_tpu.models.cosine_linear import GroupCosineLinear

        x = self._x(4)
        tm = modlin_ref.GroupCosineLinear(self.F, 9)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x)).numpy()
        params = {"weight": t2j(tm.weight), "sigma": t2j(tm.sigma)}
        out_j = GroupCosineLinear(9).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)

    def test_split_group_cosine_linear(self):
        from grl_tpu.models.cosine_linear import SplitGroupCosineLinear

        x = self._x(5)
        tm = modlin_ref.SplitGroupCosineLinear(self.F, 5, 4)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x)).numpy()
        params = {
            "fc1": {"weight": t2j(tm.fc1.weight)},
            "fc2": {"weight": t2j(tm.fc2.weight)},
            "sigma": t2j(tm.sigma),
        }
        out_j = SplitGroupCosineLinear(5, 4).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)
