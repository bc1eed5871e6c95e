"""Graph-level classification procedure.

Re-design of the reference GraphClassificationProcedure (reference:
gnn/trainer/training_procedures/graph_classification_procedure.py:66-104):
same KV machinery but targets are per-graph labels and the model is called
in ``graph_classification`` task mode (SSLGCN) or assumed to emit
``(B, 1, C)`` graph logits. Includes the same partial backbone load as
finetuning.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grl_tpu.config import ConfigDict
from grl_tpu.trainer.metrics import confusion_matrix
from grl_tpu.trainer.procedures.finetune_kv_procedure import FinetuneKVProcedure
from grl_tpu.trainer.procedures.base_procedure import TrainState


class GraphClassificationProcedure(FinetuneKVProcedure):
    def __init__(self, model: Any, config: ConfigDict, **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self.num_classes = int(
            self.config.get_path(
                "procedure.args.n_graph_classes",
                getattr(self.model, "n_graph_classes", getattr(self.model, "output_dim")),
            )
        )

    def _graph_labels(self, batch) -> jnp.ndarray:
        return jnp.asarray(batch["graph_label"], jnp.int32).reshape(-1)

    def _supports_task_mode(self) -> bool:
        return hasattr(self.model, "n_graph_classes")

    def build_train_step(self, num_classes: int, ignore_values: Tuple[int, ...]):
        model, criterion, tx = self.model, self.criterion, self.tx
        task_mode = self._supports_task_mode()

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, V, A, labels, rng, lam):
            def loss_fn(params):
                variables = {"params": params}
                if state.constants is not None:
                    variables["constants"] = state.constants
                kwargs = {"task": "graph_classification"} if task_mode else {}
                logits = model.apply(
                    variables, (V, A), train=True, rngs={"dropout": rng}, **kwargs
                )
                logits = logits.reshape(labels.shape[0], -1)  # (B,1,C) -> (B,C)
                return criterion(logits, labels), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(preds, labels, num_classes, ignore_values)
            return (
                state.replace(
                    params=optax.apply_updates(state.params, updates),
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                loss,
                cm,
            )

        return train_step

    def build_eval_step(self, num_classes: int, ignore_values: Tuple[int, ...]):
        model, criterion = self.model, self.criterion
        task_mode = self._supports_task_mode()

        @jax.jit
        def eval_step(state: TrainState, V, A, labels, lam):
            kwargs = {"task": "graph_classification"} if task_mode else {}
            logits = model.apply(state.variables(), (V, A), train=False, **kwargs)
            logits = logits.reshape(labels.shape[0], -1)
            loss = criterion(logits, labels)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(preds, labels, num_classes, ignore_values)
            return loss, cm, preds

        return eval_step

    def _run_train_batch(self, batch, epoch):
        self._ensure_initialized(batch)
        V, A, _ = self._prepare_batch(batch)
        labels = self._graph_labels(batch)
        lam = jnp.float32(self._lambda_value(epoch))
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, loss, cm = self._train_fn(self.state, V, A, labels, step_rng, lam)
        return self._scores_from_cm(np.asarray(cm), float(loss))

    def _run_val_batch(self, batch):
        self._ensure_initialized(batch)
        V, A, _ = self._prepare_batch(batch)
        labels = self._graph_labels(batch)
        loss, cm, _ = self._eval_fn(self.state, V, A, labels, jnp.float32(1.0))
        cm = np.asarray(cm)
        return self._scores_from_cm(cm, float(loss)), cm
