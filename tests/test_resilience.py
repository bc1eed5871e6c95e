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


class TestScannedCheckpointInvariant:
    def test_checkpoint_never_overstates_progress(self, synth):
        """Under scan_steps > 1, every step checkpoint's meta.global_step
        must equal the updates actually applied to the saved state — a
        resume may never skip buffered-but-unapplied batches (VERDICT r3
        #5 / ADVICE r3 #1). batch_size=2 over 8 pages gives 4 batches per
        epoch with K=3: one fused flush (3 applied) plus a drain batch,
        exercising both the flush and the drain checkpoint paths."""
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import KVProcedure

        root, data_dir, classes_path, charset_path, input_dim = synth
        cfg = tiny_config(
            root / "scan-ckpt", data_dir, classes_path, charset_path,
            save_interval=1, scan_steps=3, num_epochs=1,
        )
        cfg["data_config"]["training"]["batch_size"] = 2
        model = GraphCNNDropEdge(
            input_dim=input_dim, output_dim=15, num_edges=6, net_size=32
        )
        proc = KVProcedure(model, cfg)
        records = []
        orig = proc.checkpointer.save_checkpoint

        def spy(state, output_dir, **kw):
            meta = kw.get("meta") or {}
            if "global_step" in meta:
                records.append((int(meta["global_step"]), int(state.step)))
            return orig(state, output_dir, **kw)

        proc.checkpointer.save_checkpoint = spy
        proc()
        assert proc._use_scan() and proc._scanned_dispatches >= 1
        assert records, "no step checkpoints were taken"
        for claimed, applied in records:
            assert claimed == applied, (
                f"checkpoint meta claims step {claimed} but the saved "
                f"state has only {applied} applied updates"
            )
        # The drain path checkpointed too: the last record covers every
        # batch of the epoch.
        assert records[-1][0] == int(proc.state.step)

    def test_resume_after_scanned_preemption(self, synth):
        """Preempt mid-epoch under scan_steps > 1 (simulated by a crash
        after the first fused flush) and resume: the fresh procedure
        starts from the applied step with no skipped updates."""
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import KVProcedure

        root, data_dir, classes_path, charset_path, input_dim = synth

        def build(resume=False):
            cfg = tiny_config(
                root / "scan-preempt", data_dir, classes_path, charset_path,
                save_interval=1, scan_steps=2, num_epochs=1, resume=resume,
            )
            model = GraphCNNDropEdge(
                input_dim=input_dim, output_dim=15, num_edges=6, net_size=32
            )
            return KVProcedure(model, cfg)

        proc = build()

        class Preempted(Exception):
            pass

        orig = proc.checkpointer.save_checkpoint
        saved_steps = []

        def crash_after_first(state, output_dir, **kw):
            path = orig(state, output_dir, **kw)
            saved_steps.append(int(state.step))
            raise Preempted()

        proc.checkpointer.save_checkpoint = crash_after_first
        with pytest.raises(Preempted):
            proc()
        assert saved_steps and saved_steps[0] > 0

        fresh = build(resume=True)
        batch = next(iter(fresh.train_loader))
        fresh._ensure_initialized(batch)
        # Host counters continue from the restored applied step.
        assert int(fresh.state.step) == saved_steps[0]
        assert fresh.global_step == saved_steps[0]
        assert fresh._applied_step == saved_steps[0]


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
