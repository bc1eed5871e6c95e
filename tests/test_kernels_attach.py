"""kernel_impl selection: attach_kernel plans the right sparse kernel and
the FullGraphProcedure product path actually routes through it
(VERDICT r2 item #1 — ELL wired into the product, selected by default)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.ops.ell import ELLGraphKernel
from grl_tpu.ops.kernels import KernelAdjacency, attach_kernel
from grl_tpu.ops.pallas.csr_spmm import CSRGraphKernel
from grl_tpu.ops.sparse import relational_neighbor_coo

from tests.test_csr_spmm import random_graph


class TestAttachKernel:
    def test_ell_is_default_and_matches_xla(self):
        *_, V, graph = random_graph(seed=11, N=120, L=2, E=700, F=8)
        adj = attach_kernel(graph, impl="ell")
        assert isinstance(adj, KernelAdjacency)
        assert isinstance(adj.kernel, ELLGraphKernel)
        out = adj.kernel.neighbor_aggregate(jnp.asarray(V))
        expected = relational_neighbor_coo(jnp.asarray(V), graph)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
        )

    def test_pallas_resolves_to_ell(self):
        *_, graph = random_graph(seed=12, N=64, L=1, E=200, F=4)
        adj = attach_kernel(graph, impl="pallas")
        assert isinstance(adj.kernel, ELLGraphKernel)

    def test_pallas_csr_selects_csr(self):
        *_, graph = random_graph(seed=13, N=64, L=1, E=200, F=4)
        adj = attach_kernel(
            graph, impl="pallas_csr", feature_dim=8,
            block_rows=64, chunk_cols=64, edge_quantum=64, unroll=4,
        )
        assert isinstance(adj.kernel, CSRGraphKernel)

    def test_xla_passthrough_and_unknown_raises(self):
        *_, graph = random_graph(seed=14, N=64, L=1, E=200, F=4)
        assert attach_kernel(graph, impl="xla") is graph
        with pytest.raises(ValueError, match="Unknown sparse kernel_impl"):
            attach_kernel(graph, impl="cuda")


class TestFullGraphProcedureWiring:
    def _run(self, kernel_impl: str, tmp_path, num_nodes=256, num_epochs=40):
        from grl_tpu.config import ConfigDict
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.data.large_graph import sbm_relational_graph
        from grl_tpu.trainer.procedures.full_graph_procedure import (
            FullGraphProcedure,
        )

        data = sbm_relational_graph(
            num_nodes=num_nodes, num_classes=5, num_relations=3,
            avg_degree=8, feature_dim=32, noise=2.0, seed=0,
        )
        model = GraphCNNDropEdge(
            input_dim=32, output_dim=5, num_edges=3, net_size=32,
            use_attention=False, kernel_impl=kernel_impl,
        )
        config = ConfigDict(
            {
                "output_dir": str(tmp_path / kernel_impl),
                "num_epochs": num_epochs,
                "max_grad_norm": 5.0,
                "optimizer": {
                    "type": "BuiltinOptimizer",
                    "args": {"type_optimizer": "Adam", "lr": 1e-2},
                },
                "logging": {"use_tensorboard": False},
            }
        )
        proc = FullGraphProcedure(model, config, data=data)
        return proc

    def test_ell_kernel_attached_and_trains(self, tmp_path):
        # Same SBM recipe as test_full_graph.py's xla-path learning test.
        proc = self._run("ell", tmp_path, num_nodes=2048, num_epochs=150)
        assert isinstance(proc.graph.kernel, ELLGraphKernel)
        acc = proc()
        assert np.isfinite(acc) and acc > 0.6, acc

    def test_pallas_alias_attaches_ell(self, tmp_path):
        proc = self._run("pallas", tmp_path)
        assert isinstance(proc.graph.kernel, ELLGraphKernel)

    def test_xla_has_no_kernel(self, tmp_path):
        proc = self._run("xla", tmp_path)
        assert getattr(proc.graph, "kernel", None) is None
