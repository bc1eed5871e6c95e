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


class FullGraphProcedure(BaseProcedure):
    """Train ``model`` on one LargeGraphData graph; returns best val acc."""

    def __init__(self, model: Any, config: ConfigDict, data: LargeGraphData,
                 **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self.data = data
        self.graph, features = to_relational_graph(data)
        self.features = jnp.asarray(features)
        self.labels = jnp.asarray(data.labels, jnp.int32)
        self.train_labels = jnp.where(
            jnp.asarray(data.train_mask), self.labels, -100
        )
        self.val_labels = jnp.where(jnp.asarray(data.val_mask), self.labels, -100)
        self._train_fn = None
        self._eval_fn = None

    def _ensure_initialized(self) -> None:
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
            model, tx, graph = self.model, self.tx, self.graph

            @partial(jax.jit, donate_argnums=(0,))
            def train_step(state: TrainState, V, labels, rng):
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

            @jax.jit
            def eval_step(state: TrainState, V, labels):
                logits = self.model.apply(state.variables(), (V, graph), train=False)
                preds = jnp.argmax(logits, axis=-1)
                mask = labels != -100
                correct = jnp.sum((preds == labels) & mask)
                return correct / jnp.maximum(jnp.sum(mask), 1)

            self._train_fn = train_step
            self._eval_fn = eval_step

    def __call__(self) -> float:
        self._ensure_initialized()
        num_epochs = int(self.config.get("num_epochs", 100))
        best_acc = 0.0
        edges = int(np.asarray(self.graph.mask).sum())
        start = time.time()
        for epoch in range(num_epochs):
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, loss = self._train_fn(
                self.state, self.features, self.train_labels, step_rng
            )
            if epoch % 10 == 0 or epoch == num_epochs - 1:
                acc = float(self._eval_fn(self.state, self.features, self.val_labels))
                best_acc = max(best_acc, acc)
                self.tb_writer.add_scalar("val_accuracy", acc, epoch)
                self.logger.info(
                    f"epoch {epoch}: loss={float(loss):.4f} val_acc={acc:.4f}"
                )
        elapsed = time.time() - start
        edges_per_sec = edges * num_epochs / max(elapsed, 1e-9)
        self.logger.info(
            f"full-graph training: {edges_per_sec:,.0f} edges/s "
            f"({num_epochs} epochs, {elapsed:.1f}s)"
        )
        self.tb_writer.close()
        return best_acc
