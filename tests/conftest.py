"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Must set flags before jax initializes its backend.
"""
import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402  (env vars above must be set first)

# The ambient axon sitecustomize imports jax at interpreter start and pins
# jax_platforms to "axon,cpu", so env vars alone don't stick — override the
# live config before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# XLA's default matmul precision is bf16-class even on CPU; parity tests
# compare against fp64-accumulated references, so pin fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
