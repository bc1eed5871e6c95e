"""Native (C++) graph builder: exact parity with the Python builder, and
with the reference oracle on the bundled fixture."""
from __future__ import annotations

import json
import os
import time

import numpy as np
import pytest

from grl_tpu.data.graph_builder import build_heuristic_adjacency
from grl_tpu.data.native import build_heuristic_adjacency_fast, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native builder toolchain unavailable"
)


def random_pages(num_pages=20, seed=0):
    from grl_tpu.data.synthetic import synthetic_page

    pages = []
    for i in range(num_pages):
        page = synthetic_page(seed * 1000 + i, num_rows=14, noise_lines=8)
        pages.append(
            [
                {"location": line["location"], "text": line["text"],
                 "type": "other", "key_type": "other"}
                for line in page
            ]
        )
    return pages


class TestNativeParity:
    def test_matches_python_builder_on_random_pages(self):
        for page in random_pages():
            py = build_heuristic_adjacency(page).astype(np.float32)
            native = build_heuristic_adjacency_fast(page).astype(np.float32)
            np.testing.assert_array_equal(py, native)

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/assets/samples/debug.json"),
        reason="reference fixture not mounted",
    )
    def test_matches_reference_on_fixture(self):
        with open("/root/reference/assets/samples/debug.json", encoding="utf-8-sig") as f:
            lines = json.load(f)
        items = []
        for it in lines:
            loc = np.array(it["location"])
            x1, x2 = loc[:, 0].min(), loc[:, 0].max()
            y1, y2 = loc[:, 1].min(), loc[:, 1].max()
            items.append(
                {"location": [[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                 "text": it["text"], "key_type": "other", "type": "other"}
            )
        py = build_heuristic_adjacency(items).astype(np.float32)
        native = build_heuristic_adjacency_fast(items).astype(np.float32)
        np.testing.assert_array_equal(py, native)

    def test_native_is_faster(self):
        pages = random_pages(num_pages=6, seed=7)
        t0 = time.perf_counter()
        for page in pages:
            build_heuristic_adjacency(page)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        for page in pages:
            build_heuristic_adjacency_fast(page)
        t_native = time.perf_counter() - t0
        # The C++ path must at least keep pace (it's typically much faster;
        # the loose bound avoids CI timing flakes).
        assert t_native < t_py * 1.2, (t_native, t_py)
