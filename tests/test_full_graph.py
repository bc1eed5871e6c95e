"""Large sparse graph path: single-chip full-batch training + multi-chip
sharded GCN parity and learning."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.config import ConfigDict
from grl_tpu.data.large_graph import sbm_relational_graph, to_relational_graph


@pytest.fixture(scope="module")
def sbm():
    return sbm_relational_graph(
        num_nodes=2048, num_classes=5, num_relations=3, avg_degree=8,
        feature_dim=32, noise=2.0, seed=0,
    )


class TestFullGraphProcedure:
    def test_sparse_training_learns(self, sbm, tmp_path):
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures.full_graph_procedure import FullGraphProcedure

        config = ConfigDict(
            {
                "experiment_name": "sbm",
                "seed": 0,
                "output_dir": str(tmp_path),
                "checkpoint_path": None,
                "num_epochs": 150,
                "max_grad_norm": 5.0,
                "loss": {"type": "CrossEntropyLoss", "args": {}},
                "optimizer": {
                    "type": "BuiltinOptimizer",
                    "args": {"type_optimizer": "Adam", "lr": 0.01},
                },
                "logging": {"use_tensorboard": False, "summary_dir_name": "summary"},
            }
        )
        # Flat sparse mode: batchless features, no dense self-attention.
        model = GraphCNNDropEdge(
            input_dim=32, output_dim=5, num_edges=3, net_size=32,
            use_attention=False,
        )
        proc = FullGraphProcedure(model, config, sbm)
        acc = proc()
        # Features alone (noise=3) are weak; graph structure must help.
        assert acc > 0.6, acc

    def test_sparse_matches_dense_forward(self, sbm):
        """Sparse COO forward == dense adjacency forward on a small graph."""
        from grl_tpu.models import GraphCNNDropEdge, init_model

        small = sbm_relational_graph(
            num_nodes=96, num_classes=4, num_relations=3, avg_degree=5,
            feature_dim=16, seed=1,
        )
        graph, feats = to_relational_graph(small)
        model = GraphCNNDropEdge(
            input_dim=16, output_dim=4, num_edges=3, net_size=16,
            use_attention=False,
        )
        V = jnp.asarray(feats)
        variables = init_model(model, jax.random.PRNGKey(0), (V, graph))
        sparse_out = model.apply(variables, (V, graph), train=False)

        N = small.features.shape[0]
        dense_A = np.zeros((1, N, 3, N), np.float32)
        dense_A[0, small.receivers, small.relations, small.senders] = 1.0
        dense_out = model.apply(
            variables, (V[None], jnp.asarray(dense_A)), train=False
        )
        np.testing.assert_allclose(
            np.asarray(sparse_out), np.asarray(dense_out[0]), rtol=2e-4, atol=2e-4
        )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestShardedGCN:
    def test_gradient_step_matches_single_device(self, sbm):
        from grl_tpu.parallel import make_mesh, partition_graph, shard_batch, replicate
        from grl_tpu.parallel.sharded_gcn import (
            init_sharded_gcn_params,
            make_sharded_train_step,
            _local_forward,
        )
        from grl_tpu.ops.sparse import RelationalGraph, relational_aggregate_coo

        mesh = make_mesh({"data": 8})
        part = partition_graph(
            sbm.senders, sbm.receivers, sbm.relations, sbm.weights,
            len(sbm.features), sbm.num_relations, 8, edge_quantum=256,
        )
        N = part.num_nodes
        F = sbm.features.shape[1]
        V = np.zeros((N, F), np.float32)
        V[: len(sbm.features)] = sbm.features
        labels = np.full(N, -100, np.int64)
        labels[: len(sbm.labels)] = np.where(sbm.train_mask, sbm.labels, -100)

        params = init_sharded_gcn_params(jax.random.PRNGKey(0), F, 16, 5, 3)
        train_step, forward = make_sharded_train_step(mesh, part, learning_rate=0.1)

        V_sh = shard_batch({"v": jnp.asarray(V)}, mesh)["v"]
        y_sh = shard_batch({"y": jnp.asarray(labels)}, mesh)["y"]
        params_r = replicate(params, mesh)
        new_params, loss = train_step(params_r, V_sh, y_sh)
        assert np.isfinite(float(loss))

        # Single-device reference: same math via the COO aggregate.
        E = len(sbm.senders)
        single = RelationalGraph(
            senders=jnp.asarray(sbm.senders), receivers=jnp.asarray(sbm.receivers),
            relations=jnp.asarray(sbm.relations), weights=jnp.asarray(sbm.weights),
            mask=jnp.ones(E, bool), num_nodes=N, num_relations=3,
        )

        def ref_loss(p):
            def conv(feats, w, b):
                return relational_aggregate_coo(feats, single) @ w + b

            h = jax.nn.relu(conv(jnp.asarray(V), p["w1"], p["b1"]))
            logits = conv(h, p["w2"], p["b2"])
            lab = jnp.asarray(labels)
            valid = lab != -100
            safe = jnp.where(valid, lab, 0)
            nll = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), safe[:, None], axis=1
            )[:, 0]
            return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

        ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)
        np.testing.assert_allclose(float(loss), float(ref_val), rtol=1e-4)
        expected = jax.tree_util.tree_map(
            lambda pp, gg: pp - 0.1 * gg, params, ref_grads
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(new_params),
            jax.tree_util.tree_leaves(expected),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    def test_sharded_training_learns(self, sbm):
        from grl_tpu.parallel import make_mesh, partition_graph, replicate, shard_batch
        from grl_tpu.parallel.sharded_gcn import (
            init_sharded_gcn_params,
            make_sharded_train_step,
        )

        mesh = make_mesh({"data": 8})
        part = partition_graph(
            sbm.senders, sbm.receivers, sbm.relations, sbm.weights,
            len(sbm.features), sbm.num_relations, 8, edge_quantum=256,
        )
        N, F = part.num_nodes, sbm.features.shape[1]
        V = np.zeros((N, F), np.float32)
        V[: len(sbm.features)] = sbm.features
        train_labels = np.full(N, -100, np.int64)
        train_labels[: len(sbm.labels)] = np.where(sbm.train_mask, sbm.labels, -100)

        params = replicate(
            init_sharded_gcn_params(jax.random.PRNGKey(1), F, 32, 5, 3), mesh
        )
        train_step, forward = make_sharded_train_step(mesh, part, learning_rate=0.05)
        V_sh = shard_batch({"v": jnp.asarray(V)}, mesh)["v"]
        y_sh = shard_batch({"y": jnp.asarray(train_labels)}, mesh)["y"]
        first_loss = None
        for step in range(40):
            params, loss = train_step(params, V_sh, y_sh)
            if first_loss is None:
                first_loss = float(loss)
        assert float(loss) < first_loss * 0.7, (first_loss, float(loss))

        logits = np.asarray(forward(params, V_sh))[: len(sbm.labels)]
        val = sbm.val_mask
        acc = (logits.argmax(-1)[val] == sbm.labels[val]).mean()
        assert acc > 0.5, acc
