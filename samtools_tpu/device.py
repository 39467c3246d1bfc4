"""JAX platform selection.

The driver image's axon sitecustomize force-registers the TPU platform via
jax.config (overriding JAX_PLATFORMS).  SAMTPU_PLATFORM gives this
framework an override of its own: set it to "cpu" for test harnesses /
CI so CLI subprocesses don't queue on the single TPU chip.
Import this module before any jax compute module.
"""

from __future__ import annotations

import os

import jax

_p = os.environ.get("SAMTPU_PLATFORM")
if _p:
    try:
        jax.config.update("jax_platforms", _p)
    except Exception:
        pass


def default_device_kind() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "none"
