"""The PRODUCT model family on the node-partitioned (SP-analog) path.

Round 1 only partitioned a bespoke functional 2-layer GCN
(tests/test_full_graph.py); here the real flagship GraphCNNDropEdge runs
under shard_map via grl_tpu.parallel.sharded_flagship: step parity vs the
single-device sparse mode, convergence on an SBM, and the config-driven
FullGraphProcedure entry (no constructor injection needed).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from grl_tpu.config import ConfigDict
from grl_tpu.data.large_graph import sbm_relational_graph, to_relational_graph
from grl_tpu.models import GraphCNNDropEdge, init_model
from grl_tpu.parallel import make_mesh, make_partitioned_model_step, pad_node_arrays
from grl_tpu.parallel.graph_partition import partition_graph
from grl_tpu.trainer.losses import cross_entropy


@pytest.fixture(scope="module")
def sbm():
    return sbm_relational_graph(
        num_nodes=512, num_classes=6, num_relations=3, avg_degree=8,
        feature_dim=32, seed=9,
    )


def _flagship(F, C, L, **kw):
    defaults = dict(
        input_dim=F, output_dim=C, num_edges=L, net_size=32,
        use_attention=False, dropout_rate=0.0, edge_dropout_rate=0.0,
    )
    defaults.update(kw)
    return GraphCNNDropEdge(**defaults)


class TestStepParity:
    def test_partitioned_step_matches_single_device(self, sbm):
        """One deterministic train step of the partitioned flagship equals
        the single-device sparse-mode step (grads ride the ring halo)."""
        model = _flagship(32, sbm.num_classes, sbm.num_relations)
        graph, feats = to_relational_graph(sbm)
        V = jnp.asarray(feats)
        labels = np.where(sbm.train_mask, sbm.labels, -100).astype(np.int32)
        variables = init_model(model, jax.random.PRNGKey(0), (V, graph))
        params, constants = variables["params"], variables.get("constants")
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)
        rng = jax.random.PRNGKey(1)

        # single device
        def loss_fn(p):
            logits = model.apply(
                {"params": p, "constants": constants}, (V, graph),
                train=True, rngs={"dropout": rng},
            )
            return cross_entropy(logits, jnp.asarray(labels))

        loss_s, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(grads, opt_state, params)
        params_s = optax.apply_updates(params, updates)

        # partitioned over 4 shards
        mesh = make_mesh({"data": 4})
        part = partition_graph(
            sbm.senders, sbm.receivers, sbm.relations, sbm.weights,
            num_nodes=len(sbm.features), num_relations=sbm.num_relations,
            num_shards=4, edge_quantum=128,
        )
        feats_p, labels_p = pad_node_arrays(
            np.asarray(feats, np.float32), labels, part.num_nodes
        )
        step, forward = make_partitioned_model_step(model, mesh, part, tx)
        params_p, _, loss_p = step(
            params, constants, opt_state,
            jnp.asarray(feats_p), jnp.asarray(labels_p), rng,
        )
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-5)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params_s),
            jax.tree_util.tree_leaves_with_path(params_p),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=str(pa),
            )

        # eval forward parity too
        logits_s = model.apply(
            {"params": params_s, "constants": constants}, (V, graph), train=False
        )
        logits_p = forward(params_p, constants, jnp.asarray(feats_p))
        np.testing.assert_allclose(
            np.asarray(logits_p)[: len(feats)], np.asarray(logits_s),
            rtol=1e-4, atol=1e-4,
        )


class TestConvergence:
    def test_partitioned_flagship_learns_with_dropedge(self, sbm):
        """8-way partitioned flagship WITH DropEdge + dropout converges on
        the SBM (per-device masks drawn independently)."""
        model = _flagship(
            32, sbm.num_classes, sbm.num_relations,
            dropout_rate=0.1, edge_dropout_rate=0.1,
        )
        mesh = make_mesh({"data": 8})
        part = partition_graph(
            sbm.senders, sbm.receivers, sbm.relations, sbm.weights,
            num_nodes=len(sbm.features), num_relations=sbm.num_relations,
            num_shards=8, edge_quantum=128,
        )
        labels = np.where(sbm.train_mask, sbm.labels, -100).astype(np.int32)
        val = np.where(sbm.val_mask, sbm.labels, -100).astype(np.int32)
        feats_p, labels_p = pad_node_arrays(
            np.asarray(sbm.features, np.float32), labels, part.num_nodes
        )
        _, val_p = pad_node_arrays(
            np.asarray(sbm.features, np.float32), val, part.num_nodes
        )
        graph, feats = to_relational_graph(sbm)
        variables = init_model(
            model, jax.random.PRNGKey(0), (jnp.asarray(feats), graph)
        )
        params, constants = variables["params"], variables.get("constants")
        tx = optax.adam(5e-3)
        opt_state = tx.init(params)
        step, forward = make_partitioned_model_step(model, mesh, part, tx)
        Vp, Lp = jnp.asarray(feats_p), jnp.asarray(labels_p)
        rng = jax.random.PRNGKey(2)
        first = None
        for i in range(40):
            rng, k = jax.random.split(rng)
            params, opt_state, loss = step(params, constants, opt_state, Vp, Lp, k)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.7, (first, float(loss))
        logits = np.asarray(forward(params, constants, Vp))
        preds = logits.argmax(-1)
        mask = val_p != -100
        acc = (preds[mask] == val_p[mask]).mean()
        assert acc > 0.55, acc


class TestFullGraphProcedureConfig:
    def test_config_driven_partitioned_procedure(self, tmp_path):
        """FullGraphProcedure builds its graph from config (no data= arg)
        and goes partitioned when config.parallel.mesh says so."""
        from grl_tpu.trainer.procedures import FullGraphProcedure

        cfg = ConfigDict(
            {
                "experiment_name": "fullgraph-config",
                "seed": 0,
                "output_dir": str(tmp_path),
                "num_epochs": 8,
                # Also covers scan_steps on the partitioned (shard_map)
                # path: 4 dispatches of 2 fused steps each.
                "scan_steps": 2,
                "parallel": {"mesh": {"data": 4}},
                "data_config": {
                    "large_graph": {
                        "type": "sbm",
                        "args": {
                            "num_nodes": 256, "num_classes": 5,
                            "num_relations": 2, "avg_degree": 8,
                            "feature_dim": 16, "seed": 3,
                        },
                    }
                },
                "optimizer": {
                    "type": "BuiltinOptimizer",
                    "args": {"type_optimizer": "Adam", "lr": 0.01},
                },
                "logging": {"use_tensorboard": False, "summary_dir_name": "s"},
            }
        )
        model = _flagship(16, 5, 2, dropout_rate=0.1, edge_dropout_rate=0.1)
        proc = FullGraphProcedure(model, cfg)
        assert proc._partitioned
        acc = proc()
        assert np.isfinite(acc) and acc > 0.0
