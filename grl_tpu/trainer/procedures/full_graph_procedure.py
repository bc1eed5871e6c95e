"""Full-batch node classification on one large sparse graph (OGB-style).

The reference has no large-graph story (everything is per-page dense
padding — SURVEY.md §5 "long-context"); this procedure is the sparse-path
trainer the BASELINE targets (configs 3-5): a single static-shape COO
graph, flat node features, masked full-batch cross-entropy, one jitted
train step. Models run in their sparse mode
(:class:`grl_tpu.ops.sparse.RelationalGraph` adjacency, flat features);
dense-only blocks (NodeSelfAtten) must be disabled at this scale.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grl_tpu.config import ConfigDict
from grl_tpu.data.large_graph import LargeGraphData, to_relational_graph
from grl_tpu.models.base import count_parameters, init_model
from grl_tpu.trainer.losses import cross_entropy
from grl_tpu.trainer.procedures.base_procedure import BaseProcedure, TrainState


def large_graph_from_config(config: ConfigDict) -> LargeGraphData:
    """Build the full-batch graph from ``config.data_config.large_graph``:
    ``{type: sbm, args: {...}}`` (synthetic OGB-style SBM) or
    ``{type: npz, path: ...}`` (arrays named like LargeGraphData fields)."""
    spec = config.get_path("data_config.large_graph")
    if not spec:
        raise ValueError(
            "FullGraphProcedure needs either a `data=` argument or a "
            "config.data_config.large_graph block ({type: sbm|npz, ...})."
        )
    kind = spec.get("type", "sbm")
    if kind == "sbm":
        from grl_tpu.data.large_graph import sbm_relational_graph

        return sbm_relational_graph(**dict(spec.get("args", {}) or {}))
    if kind == "npz":
        loaded = np.load(spec["path"])
        return LargeGraphData(
            features=loaded["features"].astype(np.float32),
            labels=loaded["labels"].astype(np.int32),
            senders=loaded["senders"].astype(np.int32),
            receivers=loaded["receivers"].astype(np.int32),
            relations=loaded["relations"].astype(np.int32),
            weights=loaded["weights"].astype(np.float32),
            train_mask=loaded["train_mask"].astype(bool),
            val_mask=loaded["val_mask"].astype(bool),
            num_classes=int(loaded["num_classes"]),
            num_relations=int(loaded["num_relations"]),
        )
    raise ValueError(f"Unknown large_graph type: {kind}")


class FullGraphProcedure(BaseProcedure):
    """Train ``model`` on one LargeGraphData graph; returns best val acc.

    Single-device: sparse COO mode (RelationalGraph). Under a
    ``config.parallel.mesh``: node-partitioned SPMD — the model's
    GraphConvs run the ring-halo aggregation over the ``data`` axis
    (grl_tpu.parallel.sharded_flagship), the SP-analog capability the
    reference lacks (SURVEY.md §2.6).
    """

    def __init__(self, model: Any, config: ConfigDict,
                 data: Optional[LargeGraphData] = None, **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self.data = data if data is not None else large_graph_from_config(config)
        data = self.data
        self._partitioned = self.mesh is not None
        labels = np.asarray(data.labels, np.int32)
        train_labels = np.where(data.train_mask, labels, -100)
        val_labels = np.where(data.val_mask, labels, -100)
        if self._partitioned:
            from grl_tpu.parallel.graph_partition import partition_graph
            from grl_tpu.parallel.sharded_flagship import (
                pad_node_arrays,
                scatter_node_arrays,
            )

            self.part = partition_graph(
                np.asarray(data.senders), np.asarray(data.receivers),
                np.asarray(data.relations), np.asarray(data.weights),
                num_nodes=len(data.features),
                num_relations=data.num_relations,
                num_shards=int(self.mesh.shape["data"]),
                # Degree-balanced node->shard assignment bounds the
                # per-cell padding on skewed (power-law) graphs; the node
                # permutation is applied to features/labels below, so
                # training/eval numerics are unchanged.
                balance=bool(
                    self.config.get_path("parallel.balance_partition", False)
                ),
            )
            # Features are placed once; the val labels share the same
            # placement with features=None (no discarded (N, F) copy —
            # ADVICE r4 #3).
            if self.part.node_perm is not None:
                feats, self._train_np = scatter_node_arrays(
                    self.part.node_perm,
                    np.asarray(data.features, np.float32), train_labels,
                    self.part.num_nodes,
                )
                _, self._val_np = scatter_node_arrays(
                    self.part.node_perm, None, val_labels,
                    self.part.num_nodes,
                )
            else:
                feats, self._train_np = pad_node_arrays(
                    np.asarray(data.features, np.float32), train_labels,
                    self.part.num_nodes,
                )
                _, self._val_np = pad_node_arrays(
                    None, val_labels, self.part.num_nodes,
                )
            self.graph = None
            self.features = jnp.asarray(feats)
            self.train_labels = jnp.asarray(self._train_np)
            self.val_labels = jnp.asarray(self._val_np)
        else:
            self.graph, features = to_relational_graph(data)
            impl = getattr(model, "kernel_impl", "xla")
            # Plan the fused sparse-attention kernel whenever the model
            # will run sparse attention on this static graph.
            # Attention fusion is planned independently of the
            # aggregation kernel choice, so kernel_impl='xla' models with
            # sparse attention still get the fused attention kernel
            # (ADVICE r3 #4).
            plan_atten = bool(
                getattr(model, "use_attention", False)
                and getattr(model, "attention_impl", "") == "sparse"
            )
            if impl != "xla" or plan_atten:
                # Config-reachable TPU sparse path: the same `kernel_impl`
                # model arg that picks the fused dense kernel plans a sparse
                # kernel for the static graph here (host-side, once) —
                # SURVEY §2.7 row 1. "pallas"/"ell" select the scatter-free
                # ELL dual-gather tables (the fast path); "pallas_csr" the
                # blocked-CSR Pallas kernel; "tile" the tile-dense hybrid
                # (MXU tiles over the LPA community reordering + ELL
                # residual — grl_tpu/ops/tile.py).
                from grl_tpu.ops.kernels import attach_kernel

                plan_kwargs = dict(
                    self.config.get_path("kernel_plan", {}) or {}
                )
                self.graph = attach_kernel(
                    self.graph, impl=impl,
                    feature_dim=2 * int(getattr(model, "net_size", 256)),
                    attention=plan_atten,
                    **plan_kwargs,
                )
            node_perm = getattr(
                getattr(self.graph, "kernel", None), "node_perm", None
            )
            if node_perm is not None:
                # The kernel reordered the node space at plan time (tile
                # community packing): place features/labels in the
                # permuted order ONCE here — the step then pays zero
                # permutation cost, and val metrics are permutation-
                # invariant (masked mean over the same label multiset).
                from grl_tpu.parallel.sharded_flagship import (
                    scatter_node_arrays,
                )

                features, train_labels = scatter_node_arrays(
                    node_perm, np.asarray(features, np.float32),
                    train_labels, len(features),
                )
                _, val_labels = scatter_node_arrays(
                    node_perm, None, val_labels, len(features),
                )
            self.features = jnp.asarray(features)
            self.train_labels = jnp.asarray(train_labels)
            self.val_labels = jnp.asarray(val_labels)
        self._train_fn = None
        self._eval_fn = None
        self._step_body = None
        self._scan_cache: Dict[int, Any] = {}
        # Fuse K consecutive steps into one dispatch (config: scan_steps).
        self._scan_k = max(1, int(self.config.get("scan_steps", 1)))

    def _scan_fn(self, K: int):
        """Jitted dispatch advancing exactly ``K`` optimizer steps (cached
        per K): ``lax.scan`` of the step body over K rng draws with a
        donated state carry.

        Per-step dispatch pays a host round-trip between steps that can
        exceed the device step itself (measured ~1.7 ms overhead vs a
        ~1.2 ms flagship device step through the TPU tunnel —
        docs/model-performance.md); fusing K steps amortizes it to 1/K.
        ``K=1`` keeps plain per-step dispatch. A final partial chunk uses
        a remainder-K scan so training runs EXACTLY config num_epochs
        steps (ADVICE r3 #3 — the loop previously rounded up to K).
        """
        if K not in self._scan_cache:
            step_body = self._step_body
            if K <= 1:
                self._scan_cache[K] = jax.jit(step_body, donate_argnums=(0,))
            else:

                @partial(jax.jit, donate_argnums=(0,))
                def scanned(state, graph, V, labels, rng):
                    def body(st, r):
                        return step_body(st, graph, V, labels, r)

                    state, losses = jax.lax.scan(
                        body, state, jax.random.split(rng, K)
                    )
                    return state, losses[-1]

                self._scan_cache[K] = scanned
        return self._scan_cache[K]

    def _ensure_initialized(self) -> None:
        if self._partitioned:
            self._ensure_initialized_partitioned()
            return
        if self.state is None:
            variables = init_model(
                self.model, self.rng, (self.features, self.graph), train=False
            )
            self.logger.info(
                f"Sparse model params: {count_parameters(variables['params']):,} | "
                f"nodes={self.graph.num_nodes:,} "
                f"edges={int(np.asarray(self.graph.mask).sum()):,}"
            )
            self.state = TrainState(
                params=variables["params"],
                constants=variables.get("constants"),
                batch_stats=variables.get("batch_stats"),
                opt_state=self.tx.init(variables["params"]),
                step=jnp.zeros((), jnp.int32),
            )
            self.state = self._load_prev_checkpoint(self.state)
        if self._train_fn is None:
            model, tx = self.model, self.tx

            # The graph rides through the jit boundary as an ARGUMENT
            # (flax.struct pytree): its edge arrays — and, decisively,
            # the attached kernel's table pytree (kernel_tables) — lower
            # to XLA parameters instead of embedded constants, which the
            # TPU tunnel's compile service re-uploads per compile and
            # size-caps (grl_tpu/ops/pallas/csr_spmm.py CSRAdjacency).
            def step_body(state: TrainState, graph, V, labels, rng):
                def loss_fn(params):
                    variables = {"params": params}
                    if state.constants is not None:
                        variables["constants"] = state.constants
                    logits = model.apply(
                        variables, (V, graph), train=True, rngs={"dropout": rng}
                    )
                    return cross_entropy(logits, labels)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                return (
                    state.replace(
                        params=optax.apply_updates(state.params, updates),
                        opt_state=new_opt,
                        step=state.step + 1,
                    ),
                    loss,
                )

            self._step_body = step_body
            train_step = self._scan_fn(self._scan_k)

            @jax.jit
            def eval_step(state: TrainState, graph, V, labels):
                logits = self.model.apply(state.variables(), (V, graph), train=False)
                preds = jnp.argmax(logits, axis=-1)
                mask = labels != -100
                correct = jnp.sum((preds == labels) & mask)
                return correct / jnp.maximum(jnp.sum(mask), 1)

            self._train_fn = train_step
            self._eval_fn = eval_step

    def _ensure_initialized_partitioned(self) -> None:
        if self.state is None:
            from grl_tpu.ops.sparse import RelationalGraph

            # Params depend only on feature widths: init against a tiny
            # single-device RelationalGraph slice of the same relations.
            k = min(64, len(self.data.features))
            tiny = RelationalGraph(
                senders=jnp.zeros(8, jnp.int32),
                receivers=jnp.zeros(8, jnp.int32),
                relations=jnp.zeros(8, jnp.int32),
                weights=jnp.zeros(8, jnp.float32),
                mask=jnp.zeros(8, bool),
                num_nodes=k,
                num_relations=self.data.num_relations,
            )
            variables = init_model(
                self.model, self.rng,
                (jnp.asarray(self.data.features[:k]), tiny), train=False,
            )
            self.logger.info(
                f"Partitioned model params: "
                f"{count_parameters(variables['params']):,} | "
                f"shards={int(self.mesh.shape['data'])} "
                f"nodes={self.part.num_nodes:,} "
                f"edges={int(np.asarray(self.part.mask).sum()):,}"
            )
            state = TrainState(
                params=variables["params"],
                constants=variables.get("constants"),
                batch_stats=variables.get("batch_stats"),
                opt_state=self.tx.init(variables["params"]),
                step=jnp.zeros((), jnp.int32),
            )
            self.state = self._load_prev_checkpoint(state)
        if self._train_fn is None:
            from grl_tpu.parallel.sharded_flagship import (
                make_partitioned_model_step,
            )

            step, fwd = make_partitioned_model_step(
                self.model, self.mesh, self.part, self.tx
            )

            # `graph` arg unused here (the partition plan lives in the
            # shard_map closures) — kept for the uniform train-fn
            # signature shared with the single-device branch.
            def step_body(state: TrainState, graph, V, labels, rng):
                params, opt_state, loss = step(
                    state.params, state.constants, state.opt_state,
                    V, labels, rng,
                )
                return (
                    state.replace(
                        params=params, opt_state=opt_state, step=state.step + 1
                    ),
                    loss,
                )

            self._step_body = step_body
            train_fn = self._scan_fn(self._scan_k)

            def eval_fn(state: TrainState, graph, V, labels):
                logits = fwd(state.params, state.constants, V)
                preds = jnp.argmax(logits, axis=-1)
                mask = labels != -100
                correct = jnp.sum((preds == labels) & mask)
                return correct / jnp.maximum(jnp.sum(mask), 1)

            self._train_fn = train_fn
            self._eval_fn = eval_fn

    def __call__(self) -> float:
        self._ensure_initialized()
        num_epochs = int(self.config.get("num_epochs", 100))
        best_acc = 0.0
        mask = self.part.mask if self._partitioned else self.graph.mask
        edges = int(np.asarray(mask).sum())
        start = time.time()
        K = self._scan_k
        # Each dispatch advances min(K, remaining) epochs (full-graph
        # steps); the final chunk is a remainder-K scan, so training runs
        # EXACTLY num_epochs steps.
        total = 0
        for first in range(0, num_epochs, K):
            k_eff = min(K, num_epochs - first)
            self.rng, step_rng = jax.random.split(self.rng)
            fn = self._train_fn if k_eff == K else self._scan_fn(k_eff)
            self.state, loss = fn(
                self.state, self.graph, self.features, self.train_labels,
                step_rng,
            )
            epoch = first + k_eff - 1
            total = epoch + 1
            # Eval on the first chunk (the epoch-0 baseline metric), on
            # every crossing of a 10-epoch boundary, and at the end.
            if (
                first == 0
                or first // 10 != (first + k_eff) // 10
                or first + k_eff >= num_epochs
            ):
                acc = float(
                    self._eval_fn(
                        self.state, self.graph, self.features, self.val_labels
                    )
                )
                best_acc = max(best_acc, acc)
                self.tb_writer.add_scalar("val_accuracy", acc, epoch)
                self.logger.info(
                    f"epoch {epoch}: loss={float(loss):.4f} val_acc={acc:.4f}"
                )
        elapsed = time.time() - start
        edges_per_sec = edges * total / max(elapsed, 1e-9)
        self.logger.info(
            f"full-graph training: {edges_per_sec:,.0f} edges/s "
            f"({total} epochs, {elapsed:.1f}s)"
        )
        self.tb_writer.close()
        return best_acc
