"""Determinism + preemption-resume + profiling-hook tests (the aux
subsystems the reference lacks — SURVEY.md §5)."""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

import jax


def tiny_config(root, data_dir, classes_path, charset_path, **overrides):
    from grl_tpu.config import ConfigDict

    split = {
        "data_path": [data_dir],
        "class_path": classes_path,
        "charset_path": charset_path,
        "key_types": ["key", "value"],
        "batch_size": 4,
        "shuffle": True,
        "drop_last": False,
        "data_collate": {"BucketPadding": {"quantum": 64, "only_selected_items": True}},
        "data_process": {
            "TextlineEncoding": {"is_normalized_text": True},
            "HeuristicGraphBuilder": {"num_edges": 6, "edge_type": "normal_binary"},
            "NodeLabeling": {},
        },
        "augmentations": {},
    }
    cfg = {
        "experiment_name": "resilience",
        "seed": 0,
        "is_train": True,
        "output_dir": str(root),
        "checkpoint_path": None,
        "num_epochs": 2,
        "max_grad_norm": 5.0,
        "model_dir_name": "models",
        "data_config": {
            "dataset": {
                "type": "CassiaDataset",
                "args": {"node_label_padding_value": -100, "other_class_index": None},
            },
            "training": dict(split),
            "validation": dict(split),
        },
        "loss": {"type": "CrossEntropyLoss", "args": {}},
        "optimizer": {
            "type": "BuiltinOptimizer",
            "args": {"type_optimizer": "Adam", "lr": 0.005},
        },
        "logging": {"use_tensorboard": False, "summary_dir_name": "summary"},
    }
    cfg.update(overrides)
    return ConfigDict(cfg)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from grl_tpu.data.synthetic import synthetic_dataset_files

    root = tmp_path_factory.mktemp("resil")
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        str(root), num_pages=8, seed=3
    )
    charset = json.load(open(charset_path))["charset"]
    return root, data_dir, classes_path, charset_path, len(charset) + 4


def run_proc(synth, out_name, **overrides):
    from grl_tpu.models import GraphCNNDropEdge
    from grl_tpu.trainer.procedures import KVProcedure

    root, data_dir, classes_path, charset_path, input_dim = synth
    cfg = tiny_config(
        root / out_name, data_dir, classes_path, charset_path, **overrides
    )
    model = GraphCNNDropEdge(input_dim=input_dim, output_dim=15, num_edges=6, net_size=32)
    proc = KVProcedure(model, cfg)
    proc()
    return proc


class TestDeterminism:
    def test_same_seed_identical_params(self, synth):
        p1 = run_proc(synth, "det-a")
        p2 = run_proc(synth, "det-b")
        for a, b in zip(
            jax.tree_util.tree_leaves(p1.state.params),
            jax.tree_util.tree_leaves(p2.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPreemptionResume:
    def test_save_interval_and_auto_resume(self, synth):
        proc = run_proc(synth, "resume", save_interval=1)
        steps_done = int(proc.state.step)
        assert steps_done > 0
        ckpt = os.path.join(proc.model_dir, "model_latest")
        assert os.path.exists(ckpt)

        # Simulate preemption: a fresh procedure with resume: true picks up
        # the full state (params + optimizer + step).
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import KVProcedure

        root, data_dir, classes_path, charset_path, input_dim = synth
        cfg = tiny_config(
            root / "resume", data_dir, classes_path, charset_path,
            save_interval=1, resume=True,
        )
        model = GraphCNNDropEdge(input_dim=input_dim, output_dim=15, num_edges=6, net_size=32)
        fresh = KVProcedure(model, cfg)
        batch = next(iter(fresh.train_loader))
        fresh._ensure_initialized(batch)
        assert int(fresh.state.step) == steps_done
        for a, b in zip(
            jax.tree_util.tree_leaves(proc.state.params),
            jax.tree_util.tree_leaves(fresh.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestProfilingHook:
    def test_trace_window_written(self, synth):
        proc = run_proc(
            synth, "prof", logging={
                "use_tensorboard": False,
                "summary_dir_name": "summary",
                "profile": {"start_step": 1, "num_steps": 1},
            },
        )
        trace_dir = os.path.join(proc.config["output_dir"], "traces")
        assert os.path.isdir(trace_dir)
        found = []
        for dirpath, _, files in os.walk(trace_dir):
            found.extend(files)
        assert found, "no profiler trace files written"
