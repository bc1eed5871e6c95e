"""Import smoke test over all subpackages (the reference's template idea —
reference: tests/test_import.py:2-8 — made real)."""
from __future__ import annotations

import importlib

import pytest

import grl_tpu


@pytest.mark.parametrize("package", grl_tpu._packages)
def test_subpackage_imports(package):
    module = importlib.import_module(package)
    assert module is not None


def test_public_api_surface():
    from grl_tpu import GNNLearningWarper  # noqa: F401
    from grl_tpu.models import MODEL_REGISTRY

    assert len(MODEL_REGISTRY) >= 10
