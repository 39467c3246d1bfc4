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

# Persistent compilation cache: TPU compiles cost tens of seconds (worse
# over the axon tunnel) and tools run as short-lived CLI processes — the
# disk cache makes every shape a one-time cost per machine.
_cache = os.environ.get("SAMTPU_JAX_CACHE", "/tmp/samtpu_jax_cache")
if _cache and _cache != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def default_device_kind() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "none"
