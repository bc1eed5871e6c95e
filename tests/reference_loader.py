"""Utilities to import the PyTorch reference package for parity testing.

The reference at /root/reference is used read-only as the numerical oracle:
tests instantiate its torch modules, copy their weights into grl_tpu flax
variables, and assert allclose on activations. Missing third-party deps of
the reference (colorlog, decouple, neptune, ...) are stubbed so that only
torch is actually exercised.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    """Stub the reference's logging/tracking deps with inert fakes."""
    import logging

    import tempfile

    log_dir = tempfile.mkdtemp(prefix="ref_logs_")

    if "colorlog" not in sys.modules:
        _stub_module(
            "colorlog",
            ColoredFormatter=lambda *a, **k: logging.Formatter(),
            StreamHandler=logging.StreamHandler,
            basicConfig=lambda **k: None,
        )
    if "decouple" not in sys.modules:
        _stub_module("decouple", config=lambda *a, **k: log_dir)
    if "neptune" not in sys.modules:
        neptune = _stub_module("neptune", init_run=lambda **k: None)
        _stub_module("neptune.new", init_run=lambda **k: None)
        neptune.new = sys.modules["neptune.new"]
    if "anyconfig" not in sys.modules:
        _stub_module("anyconfig", load=lambda p: {})
    if "munch" not in sys.modules:
        _stub_module("munch", munchify=lambda d: d, Munch=dict)
    if "tensorboardX" not in sys.modules:
        _stub_module("tensorboardX", SummaryWriter=object)


def import_reference_models():
    """Import reference model modules (robust_gcn etc.) with stubs in place."""
    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    robust_gcn = importlib.import_module("gnn.models.networks.robust_gcn")
    drop_robust_gcn = importlib.import_module("gnn.models.networks.drop_robust_gcn")
    return robust_gcn, drop_robust_gcn


def import_reference_module(name: str):
    """Import any reference module (e.g. 'gnn.models.networks.rp_robust_gcn')
    with the dependency stubs in place."""
    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(name)
