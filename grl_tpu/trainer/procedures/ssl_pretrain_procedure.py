"""Self-supervised pretraining over a task list.

Re-design of the reference SSLPretrainProcedure (reference: gnn/trainer/
training_procedures/ssl_pretrain_procedure.py:12-123): per step, every
configured SSL task contributes a loss; the summed loss backprops through
the shared trunk. The DGI contrastive head lives in a DGI wrapper whose
discriminator params join the train state. All task losses are computed
inside ONE jitted step (the reference runs a separate eager forward per
task per step).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grl_tpu.config import ConfigDict
from grl_tpu.models.ssl_gcn import DGI
from grl_tpu.trainer import losses
from grl_tpu.trainer.metrics import confusion_matrix
from grl_tpu.trainer.procedures.base_procedure import TrainState
from grl_tpu.trainer.procedures.kv_procedure import KVProcedure

SSL_CRITERIONS = {
    "node_property": losses.masked_mse,
    "edge_mask": losses.binary_cross_entropy_with_logits,
    "pairwise_distance": losses.cross_entropy,
    "pairwise_similarity": losses.masked_mse,
    "graph_edit_distance": losses.masked_mse,
    "dgi": losses.binary_cross_entropy_with_logits,
}


class SSLPretrainProcedure(KVProcedure):
    def __init__(self, model: Any, config: ConfigDict, tasks: List[str], **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self.tasks = list(tasks)
        emb_dim = int(self.config.get_path("network.args.net_size", model.net_size)) // 2
        self.emb_dim = emb_dim
        self.dgi = DGI(encoder=self.model, output_dim=emb_dim)

    # ------------------------------------------------------------------
    def _ensure_initialized(self, batch: Dict[str, Any]) -> None:
        if self.state is None:
            V, A, _ = self._prepare_batch(batch)
            if "dgi" in self.tasks:
                from grl_tpu.models.ssl_gcn import init_dgi_variables

                variables = init_dgi_variables(
                    self.dgi, self.rng, V, A, emb_dim=self.emb_dim
                )
                from grl_tpu.models.base import count_parameters

                self.logger.info(
                    f"Num parameters (incl. DGI head): "
                    f"{count_parameters(variables['params']):,}"
                )
                state = TrainState(
                    params=variables["params"],
                    constants=variables.get("constants"),
                    batch_stats=variables.get("batch_stats"),
                    opt_state=self.tx.init(variables["params"]),
                    step=jnp.zeros((), jnp.int32),
                )
                self.state = self._load_prev_checkpoint(state)
            else:
                self.init_state((V, A))
        if self._train_fn is None:
            self._train_fn = self._build_ssl_train_step()
            self._eval_fn = self.build_eval_step(self.num_classes, self._ignore)

    def _task_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Device arrays for every configured task (pytree into jit)."""
        wanted = {"textline_encoding", "adjacency_matrix", "node_label", "node_mask"}
        for task in self.tasks:
            if task == "node_property":
                wanted.add("node_property")
            elif task in ("edge_mask", "pairwise_distance", "pairwise_similarity"):
                wanted.update({f"{task}_indices", f"{task}_targets"})
            elif task == "graph_edit_distance":
                wanted.update(
                    {"graph_edit_distance", "aug_textline_encoding", "aug_adjacency_matrix"}
                )
            elif task == "dgi":
                wanted.update(
                    {"dgi", "negative_textline_encoding", "negative_adjacency_matrix"}
                )
        out = {}
        for key in wanted:
            if key in batch:
                value = np.asarray(batch[key])
                if value.dtype == np.float16 or value.dtype == np.float64:
                    value = value.astype(np.float32)
                out[key] = jnp.asarray(value)
        return out

    def _build_ssl_train_step(self):
        model, tasks, tx = self.model, self.tasks, self.tx
        dgi = self.dgi
        uses_dgi = "dgi" in tasks

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, data: Dict[str, jnp.ndarray], rng):
            V = data["textline_encoding"]
            A = data["adjacency_matrix"]

            def apply_model(params, inputs, rng, **kwargs):
                variables = {"params": params}
                if state.constants is not None:
                    variables["constants"] = state.constants
                if uses_dgi:
                    variables_enc = dict(variables)
                    variables_enc["params"] = params["encoder"]
                    if state.constants is not None and "encoder" in (state.constants or {}):
                        variables_enc["constants"] = state.constants["encoder"]
                    return model.apply(
                        variables_enc, inputs, train=True,
                        rngs={"dropout": rng}, **kwargs,
                    )
                return model.apply(
                    variables, inputs, train=True, rngs={"dropout": rng}, **kwargs
                )

            def loss_fn(params):
                total = 0.0
                rngs = jax.random.split(rng, len(tasks) + 1)
                for i, task in enumerate(tasks):
                    if task == "node_property":
                        pred = apply_model(params, (V, A), rngs[i], task=task)
                        total += SSL_CRITERIONS[task](pred, data[task].astype(jnp.float32))
                    elif task in ("edge_mask", "pairwise_distance", "pairwise_similarity"):
                        pred = apply_model(
                            params, (V, A), rngs[i], task=task,
                            edges=data[f"{task}_indices"].astype(jnp.int32),
                        )
                        target = data[f"{task}_targets"]
                        if task == "pairwise_distance":
                            target = target.astype(jnp.int32)
                        else:
                            target = target.astype(jnp.float32)
                        total += SSL_CRITERIONS[task](pred, target)
                    elif task == "graph_edit_distance":
                        pred = apply_model(
                            params,
                            (V, A, data["aug_textline_encoding"], data["aug_adjacency_matrix"]),
                            rngs[i], task=task,
                        )
                        total += SSL_CRITERIONS[task](
                            pred, data["graph_edit_distance"].astype(jnp.float32)
                        )
                    elif task == "dgi":
                        pos, neg = apply_model(
                            params,
                            (V, A, data["negative_textline_encoding"],
                             data["negative_adjacency_matrix"]),
                            rngs[i], task=task,
                        )
                        variables = {"params": params}
                        scores = dgi.apply(
                            variables, pos, neg, method=dgi.forward_contrastive
                        )
                        if "node_mask" in data:
                            # Build pos/neg labels from the padding mask so
                            # padded nodes are excluded (-100 -> masked BCE).
                            mask = data["node_mask"] > 0
                            target = jnp.concatenate(
                                [
                                    jnp.where(mask, 1.0, -100.0),
                                    jnp.where(mask, 0.0, -100.0),
                                ],
                                axis=1,
                            )
                        else:
                            target = data["dgi"].astype(jnp.float32)
                        total += SSL_CRITERIONS[task](scores, target)
                return total

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_state = state.replace(
                params=optax.apply_updates(state.params, updates),
                opt_state=new_opt,
                step=state.step + 1,
            )
            # Monitor downstream node-cls quality with the current params
            # (reference: ssl_pretrain_procedure.py:105-120).
            enc_params = new_state.params["encoder"] if uses_dgi else new_state.params
            variables = {"params": enc_params}
            if state.constants is not None:
                variables["constants"] = (
                    state.constants["encoder"]
                    if uses_dgi and "encoder" in (state.constants or {})
                    else state.constants
                )
            logits = model.apply(variables, (V, A), train=False)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(
                preds, data["node_label"].astype(jnp.int32),
                self.num_classes, self._ignore,
            )
            return new_state, loss, cm

        return train_step

    def _run_train_batch(self, batch, epoch):
        self._ensure_initialized(batch)
        data = self._task_batch(batch)
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, loss, cm = self._train_fn(self.state, data, step_rng)
        self._lambda_value(epoch)
        return self._scores_from_cm(np.asarray(cm), float(loss))

    def _run_val_batch(self, batch):
        self._ensure_initialized(batch)
        V, A, labels = self._prepare_batch(batch)
        if "dgi" in self.tasks:
            enc_params = self.state.params["encoder"]
            variables = {"params": enc_params}
            if self.state.constants is not None:
                variables["constants"] = self.state.constants.get(
                    "encoder", self.state.constants
                )
            logits = self.model.apply(variables, (V, A), train=False)
            loss = losses.cross_entropy(logits, labels)
            preds = jnp.argmax(logits, axis=-1)
            cm = np.asarray(
                confusion_matrix(preds, labels, self.num_classes, self._ignore)
            )
            return self._scores_from_cm(cm, float(loss)), cm
        loss, cm, _ = self._eval_fn(self.state, V, A, labels, jnp.float32(1.0))
        cm = np.asarray(cm)
        return self._scores_from_cm(cm, float(loss)), cm
