"""Runtime platform selection helpers.

The deployment image registers the TPU PJRT plugin via sitecustomize at
interpreter start and pins ``jax_platforms``, so ``JAX_PLATFORMS`` env
vars set later are ignored. These helpers flip the live jax config before
any backend initializes.
"""
from __future__ import annotations

from typing import Optional

import jax


def ensure_platform(platform: Optional[str] = None, num_cpu_devices: Optional[int] = None) -> None:
    """Force a platform ('cpu'/'tpu'/'axon') and optional CPU device count.

    Must be called before the first JAX operation; silently keeps the
    current backend if one is already initialized.
    """
    try:
        if platform:
            name = {"tpu": "axon,cpu"}.get(platform, platform)
            jax.config.update("jax_platforms", name)
        if num_cpu_devices:
            jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
    except RuntimeError:
        pass


def device_summary() -> str:
    devices = jax.devices()
    return f"{len(devices)}x {devices[0].device_kind}" if devices else "no devices"
