"""Plan-time node reordering (grl_tpu/ops/reorder.py): permutation
validity and locality gain on community-structured graphs."""
from __future__ import annotations

import numpy as np

from grl_tpu.data.large_graph import sbm_relational_graph
from grl_tpu.ops.reorder import (
    bandwidth,
    lpa_order,
    rcm_order,
    window_locality,
)


class TestReorder:
    def _graph(self):
        return sbm_relational_graph(
            num_nodes=8192, num_classes=8, num_relations=1, avg_degree=7,
            feature_dim=8, homophily=0.8, seed=0,
        )

    def test_lpa_is_permutation_and_improves_locality(self):
        d = self._graph()
        N = len(d.features)
        perm = lpa_order(d.senders, d.receivers, N, rounds=20)
        assert sorted(perm) == list(range(N))  # a true permutation
        before = window_locality(d.senders, d.receivers, 1024)
        after = window_locality(perm[d.senders], perm[d.receivers], 1024)
        # Oracle (true communities, size ~1024): ~homophily fraction of
        # edges land in-window. LPA must recover most of that; the
        # unordered graph has ~window/N = 12%.
        assert after > 0.5, (before, after)
        assert after > before + 0.3, (before, after)

    def test_rcm_is_permutation(self):
        d = self._graph()
        N = len(d.features)
        perm = rcm_order(d.senders, d.receivers, N)
        assert sorted(perm) == list(range(N))
        assert bandwidth(perm[d.senders], perm[d.receivers]) <= N

    def test_reorder_preserves_aggregation(self):
        """Aggregating the relabeled graph on permuted features equals
        the original aggregation, row-permuted — the contract the
        procedure-level reorder relies on."""
        import jax.numpy as jnp

        from grl_tpu.ops.sparse import RelationalGraph, relational_aggregate_coo

        d = sbm_relational_graph(
            num_nodes=512, num_classes=4, num_relations=2, avg_degree=5,
            feature_dim=16, seed=1,
        )
        N = len(d.features)
        perm = lpa_order(d.senders, d.receivers, N, rounds=5)

        def agg(senders, receivers, feats):
            graph = RelationalGraph(
                senders=jnp.asarray(senders.astype(np.int32)),
                receivers=jnp.asarray(receivers.astype(np.int32)),
                relations=jnp.asarray(d.relations),
                weights=jnp.asarray(d.weights),
                mask=jnp.ones(len(senders), bool),
                num_nodes=N,
                num_relations=d.num_relations,
            )
            return np.asarray(
                relational_aggregate_coo(jnp.asarray(feats), graph)
            )

        base = agg(d.senders, d.receivers, d.features)
        feats_p = np.empty_like(d.features)
        feats_p[perm] = d.features
        out_p = agg(perm[d.senders], perm[d.receivers], feats_p)
        np.testing.assert_allclose(out_p[perm], base, rtol=1e-5, atol=1e-5)
