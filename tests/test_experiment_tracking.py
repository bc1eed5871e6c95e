"""Unit tests: ExperimentRun series file + GAT combinator helpers."""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


class TestExperimentRun:
    def test_append_and_assign_series(self, tmp_path):
        from grl_tpu.utils.experiment import ExperimentRun

        run = ExperimentRun(str(tmp_path))
        run["Train/step_loss"].append(1.5)
        run["Train/step_loss"].append(1.25)
        run["Validation/f1-score"].append(0.5, step=7)
        run["config"] = {"lr": 0.01}
        run.stop()

        records = [
            json.loads(line)
            for line in open(tmp_path / "experiment_series.jsonl")
        ]
        losses = [r for r in records if r["path"] == "Train/step_loss"]
        assert [r["value"] for r in losses] == [1.5, 1.25]
        # Auto-incremented step counter per series.
        assert [r["step"] for r in losses] == [0, 1]
        (val,) = [r for r in records if r["path"] == "Validation/f1-score"]
        assert val["step"] == 7
        (cfg,) = [r for r in records if r["path"] == "config"]
        assert cfg["value"] == {"lr": 0.01}

    def test_lazy_global_run(self, tmp_path, monkeypatch):
        from grl_tpu.utils import experiment

        monkeypatch.setattr(experiment, "_RUN", None)
        run = experiment.get_experiment_run(str(tmp_path))
        assert experiment.get_experiment_run() is run
        run.stop()


class TestGATCombinators:
    def test_tune_sequential_threads_tuples(self):
        from grl_tpu.models import GraphAttentionLayer, TuneSequential

        B, N, L, F = 1, 8, 2, 16
        model = TuneSequential(
            layers=(
                GraphAttentionLayer(no_A=L, features=F),
                GraphAttentionLayer(no_A=L, features=F),
            )
        )
        key = jax.random.PRNGKey(0)
        V = jax.random.normal(key, (B, N, F))
        A = jnp.ones((B, N, L, N))
        variables = model.init(key, V, A)
        out_V, out_A = model.apply(variables, V, A)
        assert out_V.shape == (B, N, F)
        assert out_A.shape == A.shape

    def test_make_parameter_scale(self):
        from grl_tpu.models import MakeParameterScale

        model = MakeParameterScale()
        variables = model.init(jax.random.PRNGKey(0))
        value = model.apply(variables)
        assert value.shape == (1,)
        assert 0.0 <= float(value[0]) < 1.0
