"""ctypes binding for the native (C++) heuristic graph builder.

Loads ``native/libgrlgraph.so`` (building it with g++ on first use if the
shared object is missing/stale) and exposes :func:`native_build_edges`.
Falls back to the pure-Python builder when the toolchain or scope
(cell/table nodes) doesn't apply — callers use
:func:`build_heuristic_adjacency_fast`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from grl_tpu.data.graph_builder import (
    HeuristicGraph,
    boxes_from_textlines,
    build_heuristic_adjacency,
)
from grl_tpu.utils.logging import get_logger

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "graph_builder.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libgrlgraph.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    logger = get_logger(__name__)
    try:
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
            )
            logger.info("Built native graph builder.")
        lib = ctypes.CDLL(_LIB)
        lib.grl_build_edges.restype = ctypes.c_int
        lib.grl_build_edges.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
    except Exception as err:
        logger.warning(f"Native graph builder unavailable ({err}); using Python.")
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


def native_build_edges(
    boxes: np.ndarray, has_text: np.ndarray
) -> Optional[np.ndarray]:
    """(n,4) float64 boxes + (n,) uint8 -> (E,3) int32 (src,label,dst)."""
    lib = _ensure_lib()
    if lib is None:
        return None
    n = len(boxes)
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    has_text = np.ascontiguousarray(has_text, dtype=np.uint8)
    cap = max(64, n * 16)
    while True:
        out = np.empty((cap, 3), dtype=np.int32)
        count = lib.grl_build_edges(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            has_text.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cap,
        )
        if count >= 0:
            return out[:count]
        cap *= 2


def build_heuristic_adjacency_fast(
    textlines: Sequence[Dict[str, Any]],
    edge_type: str = "normal_binary",
    num_edges: int = 6,
) -> np.ndarray:
    """Native-accelerated drop-in for ``build_heuristic_adjacency``.

    Uses C++ for the common all-textline ``normal_binary`` case; falls
    back to the Python builder for fc_* edge types or cell/table nodes.
    """
    boxes = boxes_from_textlines(textlines)
    if (
        edge_type != "normal_binary"
        or not all(b.is_textline for b in boxes)
        or not native_available()
    ):
        return build_heuristic_adjacency(textlines, edge_type, num_edges)
    n = len(boxes)
    geom = np.array([(b.x, b.y, b.w, b.h) for b in boxes], dtype=np.float64)
    has_text = np.array([1 if b.text else 0 for b in boxes], dtype=np.uint8)
    edges = native_build_edges(geom, has_text)
    adj = np.zeros((n, num_edges, n), dtype=np.float32)
    if len(edges):
        adj[edges[:, 0], edges[:, 1], edges[:, 2]] = 1.0
    return adj.astype(np.float16)
