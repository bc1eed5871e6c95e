"""scripts/ogb_to_npz.py: OGB raw layout -> large_graph npz schema,
checked on a synthetic directory mimicking the real download
(BASELINE configs 3-5 tooling; VERDICT r4 missing #2)."""
from __future__ import annotations

import gzip
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from ogb_to_npz import convert  # noqa: E402


@pytest.fixture
def ogb_dir(tmp_path):
    """A tiny synthetic tree in the exact OGB extract layout."""
    rng = np.random.RandomState(0)
    N, F, E, C = 30, 5, 80, 4
    raw = tmp_path / "ogbn_tiny" / "raw"
    split = tmp_path / "ogbn_tiny" / "split" / "time"
    raw.mkdir(parents=True)
    split.mkdir(parents=True)

    feats = rng.randn(N, F).astype(np.float32)
    labels = rng.randint(0, C, N)
    edges = rng.randint(0, N, (E, 2))

    def write(path, arr, fmt):
        with gzip.open(path, "wt") as fh:
            np.savetxt(fh, arr, delimiter=",", fmt=fmt)

    write(raw / "node-feat.csv.gz", feats, "%.6f")
    write(raw / "node-label.csv.gz", labels[:, None], "%d")
    write(raw / "edge.csv.gz", edges, "%d")
    idx = rng.permutation(N)
    write(split / "train.csv.gz", idx[:18, None], "%d")
    write(split / "valid.csv.gz", idx[18:24, None], "%d")
    write(split / "test.csv.gz", idx[24:, None], "%d")
    return tmp_path / "ogbn_tiny", feats, labels, edges, idx


class TestOGBIngest:
    def test_roundtrip_schema(self, ogb_dir, tmp_path):
        d, feats, labels, edges, idx = ogb_dir
        out = tmp_path / "tiny.npz"
        summary = convert(str(d), str(out))
        assert summary == {
            "nodes": 30, "edges": 80, "features": 5, "classes": 4,
            "train": 18, "valid": 6,
        }
        z = np.load(out)
        # %.6f text quantization: abs error <= 5e-7, so atol-dominated
        np.testing.assert_allclose(z["features"], feats, rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(z["senders"], edges[:, 0])
        np.testing.assert_array_equal(z["receivers"], edges[:, 1])
        assert int(z["num_classes"]) == 4 and int(z["num_relations"]) == 1
        # transductive protocol: labels hidden outside train/valid
        hidden = ~(z["train_mask"] | z["val_mask"])
        assert (z["labels"][hidden] == -1).all()
        visible = z["train_mask"] | z["val_mask"]
        np.testing.assert_array_equal(z["labels"][visible], labels[visible])
        assert z["train_mask"].sum() == 18 and z["val_mask"].sum() == 6

    def test_undirected_symmetrizes(self, ogb_dir, tmp_path):
        d, _, _, edges, _ = ogb_dir
        out = tmp_path / "tiny_u.npz"
        convert(str(d), str(out), undirected=True)
        z = np.load(out)
        pairs = set(zip(z["senders"].tolist(), z["receivers"].tolist()))
        for s, r in edges:
            assert (s, r) in pairs and (r, s) in pairs
        # dedup'd: no pair twice
        assert len(pairs) == len(z["senders"])

    def test_feeds_full_graph_procedure(self, ogb_dir, tmp_path):
        """The produced npz loads through the documented config path
        (large_graph: {type: npz}) into FullGraphProcedure's reader."""
        from grl_tpu.config import ConfigDict
        from grl_tpu.trainer.procedures.full_graph_procedure import (
            large_graph_from_config,
        )

        d, *_ = ogb_dir
        out = tmp_path / "tiny2.npz"
        convert(str(d), str(out))
        data = large_graph_from_config(
            ConfigDict(
                {"data_config": {"large_graph": {"type": "npz", "path": str(out)}}}
            )
        )
        assert data.features.shape == (30, 5)
        assert data.num_classes == 4
        assert data.train_mask.sum() == 18
