"""Golden-file parity of the data pipeline against the reference.

Uses /root/reference (read-only) as the oracle: its graph builder, text
normalizer and feature encoder are run on the bundled 74-textline fixture
and compared elementwise with grl_tpu's pipeline.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
DEBUG_JSON = os.path.join(REFERENCE, "assets/samples/debug.json")
CHARSET_JSON = os.path.join(REFERENCE, "assets/master_charset.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEBUG_JSON), reason="reference fixtures not mounted"
)

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module")
def debug_lines():
    with open(DEBUG_JSON, encoding="utf-8-sig") as handle:
        return json.load(handle)


@pytest.fixture(scope="module")
def charset():
    with open(CHARSET_JSON, encoding="utf-8-sig") as handle:
        return json.load(handle)["charset"]


def builder_items(lines):
    """Mimic the reference HeuristicGraphBuilder line_info construction
    (heuristic_graph_builder.py:34-50)."""
    items = []
    for it in lines:
        loc = np.array(it["location"])
        x1, x2 = loc[:, 0].min(), loc[:, 0].max()
        y1, y2 = loc[:, 1].min(), loc[:, 1].max()
        items.append(
            {
                "location": [[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                "text": it["text"],
                "key_type": it.get("key_type", "other"),
                "type": it.get("label", "other"),
            }
        )
    return items


class TestGraphBuilderGolden:
    @pytest.mark.parametrize("edge_type", ["normal_binary", "fc_binary", "fc_similarity"])
    def test_adjacency_matches_reference(self, debug_lines, edge_type):
        from gnn.data_generator.data_process.utils.graph_utils import Graph

        from grl_tpu.data.graph_builder import build_heuristic_adjacency

        items = builder_items(debug_lines)
        n = len(items)
        ref = Graph(items, edge_type).adj[:n, :, :n].astype(np.float32)
        mine = build_heuristic_adjacency(items, edge_type).astype(np.float32)
        np.testing.assert_array_equal(ref, mine)

    def test_edge_list_consistent_with_dense(self, debug_lines):
        from grl_tpu.data.graph_builder import HeuristicGraph

        graph = HeuristicGraph(builder_items(debug_lines))
        dense = np.asarray(graph.adj, dtype=np.float32)
        coo = graph.edge_list()
        rebuilt = np.zeros_like(dense)
        rebuilt[coo[:, 0], coo[:, 1], coo[:, 2]] = 1.0
        np.testing.assert_array_equal(dense, rebuilt)


class TestNormalizeText:
    def test_matches_reference_normalizer(self):
        from gnn.data_generator.data_process.utils.normalize_text import (
            normalize_text as ref_normalize,
        )

        from grl_tpu.data.normalize_text import normalize_text

        cases = [
            "Hello, WORLD! 123",
            "ＡＢＣ１２３",  # full-width -> NFKC
            "a_b–c—d–e",  # dashes
            "quote's; and_more\t\n",
            "「brackets」【test】(paren)",
            "१२३ á é 平仮名 0.5％",
            "...。・，、",
        ]
        for text in cases:
            assert normalize_text(text) == ref_normalize(text), repr(text)

    def test_corpus_restriction(self):
        from grl_tpu.data.normalize_text import normalize_text

        assert normalize_text("abc", corpus=["a", "b"]) == "ab�"


class TestFeatureEncoding:
    def test_bow_matches_sklearn(self, charset):
        sklearn = pytest.importorskip("sklearn.feature_extraction.text")

        from grl_tpu.data.features import char_bow_matrix
        from grl_tpu.data.normalize_text import normalize_text

        texts = ["Hello 123", "平仮名テスト", "mixed ＴＥＸＴ!"]
        normalized = [normalize_text(t) for t in texts]
        char_to_id = {c: i for i, c in enumerate(charset)}
        vec = sklearn.CountVectorizer(vocabulary=char_to_id, analyzer="char", binary=True)
        ref = vec.fit_transform(normalized).toarray().astype(np.float32)
        mine = char_bow_matrix(texts, char_to_id, normalized=True)
        np.testing.assert_array_equal(ref, mine)

    def test_textline_encoding_matches_reference(self, debug_lines, charset):
        pytest.importorskip("sklearn")
        from gnn.data_generator.data_process.textline_encoding import (
            TextlineEncoding as RefEncoding,
        )

        from grl_tpu.data.processors import TextlineEncoding

        char_to_id = {c: i for i, c in enumerate(charset)}
        label = {
            i: {"polygon": line["location"], "text": line["text"]}
            for i, line in enumerate(debug_lines)
        }
        ref_sample = {"label": dict(label), "char_to_id": char_to_id}
        # Reference uses np.float (removed in numpy>=1.24); shim it.
        if not hasattr(np, "float"):
            np.float = float  # noqa: NPY001
        ref_out = RefEncoding(is_normalized_text=True)(ref_sample)["textline_encoding"]
        mine = TextlineEncoding(is_normalized_text=True)(
            {"label": dict(label), "char_to_id": char_to_id}
        )["textline_encoding"]
        assert mine.shape == ref_out.shape == (len(debug_lines), len(charset) + 4)
        np.testing.assert_allclose(mine, ref_out, rtol=1e-6, atol=1e-6)


class TestCollate:
    def test_numpy_padding_symmetric(self):
        from grl_tpu.data.collate import NumpyPadding

        batch = [
            {"node_label": np.array([1, 2, 3]), "x": "keep"},
            {"node_label": np.array([4])},
        ]
        out = NumpyPadding({"node_label": -100})(batch)
        np.testing.assert_array_equal(out[0]["node_label"], [1, 2, 3])
        np.testing.assert_array_equal(out[1]["node_label"], [-100, 4, -100])

    def test_bucket_padding_masks(self):
        from grl_tpu.data.collate import BucketPadding, stack_batch

        batch = [
            {
                "textline_encoding": np.ones((5, 7), np.float32),
                "adjacency_matrix": np.ones((5, 6, 5), np.float16),
                "node_label": np.arange(5),
            },
            {
                "textline_encoding": np.ones((3, 7), np.float32),
                "adjacency_matrix": np.ones((3, 6, 3), np.float16),
                "node_label": np.arange(3),
            },
        ]
        out = BucketPadding(quantum=8)(batch)
        stacked = stack_batch(out)
        assert stacked["textline_encoding"].shape == (2, 8, 7)
        assert stacked["adjacency_matrix"].shape == (2, 8, 6, 8)
        assert stacked["node_label"].shape == (2, 8)
        assert stacked["node_mask"].sum() == 8  # 5 + 3 valid nodes
        assert stacked["node_label"][1, 3] == -100


class TestCassiaEndToEnd:
    def test_dataset_pipeline(self, tmp_path, debug_lines):
        from grl_tpu.config import ConfigDict
        from grl_tpu.data.datasets import CassiaDataset

        classes_path = tmp_path / "classes.json"
        classes_path.write_text(json.dumps({"classes": ["total", "date"]}))
        config = ConfigDict(
            {
                "charset_path": CHARSET_JSON,
                "class_path": str(classes_path),
                "key_types": ["key", "value"],
                "data_process": {
                    "TextlineEncoding": {"is_normalized_text": True},
                    "HeuristicGraphBuilder": {"num_edges": 6, "edge_type": "normal_binary"},
                    "NodeLabeling": {},
                },
                "augmentations": {},
            }
        )
        dataset = CassiaDataset(config, samples=[debug_lines], data_type="test")
        sample = dataset[0]
        n = len(debug_lines)
        assert sample["textline_encoding"].shape[0] == n
        assert sample["adjacency_matrix"].shape == (n, 6, n)
        assert sample["node_label"].shape == (n,)
        assert dataset.class_to_id["total"]["key"] == 1
        assert dataset.class_to_id["date"]["value"] == 4
