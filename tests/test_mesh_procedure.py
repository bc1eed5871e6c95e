"""Product-path SPMD: KVProcedure training over a config-declared mesh.

The reference parallelizes by wrapping the module in DDP/DataParallel and
splitting the batch per rank (reference: gnn/cl_warper.py:73-75,
gnn/trainer/training_procedures/base_procedure.py:79-93,
gnn/data_generator/base_dataloader.py:90-107). Here the SAME ``KVProcedure``
becomes multi-chip purely through ``config.parallel.mesh``: params place by
TP rules, the batch shards over the ``data`` axis (padded to a multiple of
it with masked labels), and XLA inserts the gradient reductions. These
tests pin that the sharded procedure computes the *same numbers* as the
single-device one.
"""
from __future__ import annotations

import json

import numpy as np
import pytest

import jax

from tests.test_procedures import base_config, make_split


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from grl_tpu.data.synthetic import synthetic_dataset_files

    root = tmp_path_factory.mktemp("meshproc")
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        str(root), num_pages=8, seed=3
    )
    charset = json.load(open(charset_path))["charset"]
    return root, data_dir, classes_path, charset_path, len(charset) + 4


def _make_proc(synth, name, mesh=None, batch_size=3, epochs=1):
    root, data_dir, classes_path, charset_path, input_dim = synth
    from grl_tpu.models import GraphCNNDropEdge
    from grl_tpu.trainer.procedures import KVProcedure

    split = make_split(data_dir, classes_path, charset_path)
    split["batch_size"] = batch_size
    cfg = base_config(root, split, name, epochs=epochs)
    if mesh is not None:
        cfg["parallel"] = {"mesh": mesh}
    model = GraphCNNDropEdge(
        input_dim=input_dim, output_dim=15, num_edges=6, net_size=32
    )
    return KVProcedure(model, cfg)


class TestMeshKVProcedure:
    def test_mesh_built_from_config(self, synth):
        proc = _make_proc(synth, "mesh-built", mesh={"data": 4, "model": 2})
        assert proc.mesh is not None
        assert dict(proc.mesh.shape) == {"data": 4, "model": 2}
        # {data: -1} absorbs all devices (the shipped config default).
        proc_all = _make_proc(synth, "mesh-all", mesh={"data": -1})
        assert dict(proc_all.mesh.shape) == {"data": len(jax.devices())}

    def test_params_and_batch_are_sharded(self, synth):
        proc = _make_proc(synth, "mesh-sharded", mesh={"data": 2, "model": 2})
        batch = next(iter(proc.train_loader))
        proc._ensure_initialized(batch)
        # TP rule: the frozen RanPAC expansion shards over "model".
        kernel = proc.state.constants["w_rand"]["kernel"]
        assert "model" in str(kernel.sharding.spec)
        # batch_size=3 with data=2: the batch pads to 4 and shards 2-way.
        V, A, labels = proc._prepare_batch(batch)
        assert V.shape[0] == 4 and labels.shape[0] == 4
        assert "data" in str(V.sharding.spec)
        assert bool((np.asarray(labels[-1]) == proc.pad_value).all())

    def test_sharded_training_matches_single_device(self, synth):
        """One epoch of the sharded KVProcedure reproduces the single-device
        procedure's parameters and metrics (procedure-level extension of
        tests/test_parallel.py's gradient-exact DP check)."""
        single = _make_proc(synth, "mesh-single", mesh=None)
        f1_single = single()
        sharded = _make_proc(synth, "mesh-spmd", mesh={"data": 2, "model": 2})
        f1_sharded = sharded()

        leaves_s = jax.tree_util.tree_leaves_with_path(single.state.params)
        sharded_params = jax.tree_util.tree_leaves_with_path(sharded.state.params)
        for (path_a, leaf_a), (path_b, leaf_b) in zip(leaves_s, sharded_params):
            assert path_a == path_b
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(jax.device_get(leaf_b)),
                rtol=2e-3, atol=2e-5,
                err_msg=f"param mismatch at {path_a}",
            )
        assert abs(f1_single - f1_sharded) < 1e-3

    def test_scanned_matches_stepwise_under_mesh(self, synth):
        """scan_steps composes with the data mesh (VERDICT r3 #4): the
        fused lax.scan dispatch over stacked ``(K, B, ...)`` batches with
        a ``P(None, "data", ...)`` placement reproduces the stepwise DP
        run's parameters. One shape bucket (large padding quantum) pins
        the update order, so the runs are numerically equivalent."""
        root, data_dir, classes_path, charset_path, input_dim = synth
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import KVProcedure

        def run(name, scan_steps):
            split = make_split(data_dir, classes_path, charset_path)
            split["batch_size"] = 4
            split["data_collate"] = {
                "BucketPadding": {"quantum": 1024, "only_selected_items": False}
            }
            cfg = base_config(root, split, name, epochs=1)
            cfg["parallel"] = {"mesh": {"data": 2}}
            if scan_steps > 1:
                cfg["scan_steps"] = scan_steps
            model = GraphCNNDropEdge(
                input_dim=input_dim, output_dim=15, num_edges=6, net_size=32
            )
            proc = KVProcedure(model, cfg)
            proc()
            return proc

        stepwise = run("mesh-scan-a", scan_steps=1)
        scanned = run("mesh-scan-b", scan_steps=2)
        assert scanned._use_scan() and scanned._scanned_dispatches >= 1
        assert int(scanned.state.step) == int(stepwise.state.step)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(stepwise.state.params),
            jax.tree_util.tree_leaves_with_path(scanned.state.params),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
                rtol=2e-3, atol=2e-5, err_msg=f"param mismatch at {pa}",
            )
