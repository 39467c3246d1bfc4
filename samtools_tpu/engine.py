"""Device-dispatch policy: when does a tool's compute run on the TPU?

The reference decides nothing like this — every loop is host C
(/root/reference/bam2depth.c:209, bam_plcmd.c:607).  Here each kernel
consumer (depth, coverage, bedcov, consensus counts, flagstat) asks
``use_device(n_items)`` before dispatching to the JAX/Pallas engine:

* ``SAMTPU_DEVICE=1|device|force`` — always use the device path (tests
  exercise it on the CPU backend this way).
* ``SAMTPU_DEVICE=0|host``        — never.
* default *auto*: use the device only when an accelerator is attached
  AND the workload is big enough to amortize dispatch + compile-cache
  lookup (``SAMTPU_DEVICE_MIN_ITEMS``, default 200k items).  Small
  regression fixtures stay on the numpy path; real 30x workloads ride
  the TPU.

The size check runs before any jax import, so tiny CLI invocations
never pay jax startup.
"""

from __future__ import annotations

import os

_MIN_ITEMS = int(os.environ.get("SAMTPU_DEVICE_MIN_ITEMS", "200000"))
_ACCEL = None  # cached accelerator platform ("tpu", "cpu", "none")


def accel_platform() -> str:
    """Default jax platform, cached; "none" if jax is unavailable."""
    global _ACCEL
    if _ACCEL is None:
        try:
            from . import device as _d  # applies SAMTPU_PLATFORM override
            _ACCEL = _d.default_device_kind()
        except Exception:
            _ACCEL = "none"
    return _ACCEL


def use_device(n_items: int) -> bool:
    env = os.environ.get("SAMTPU_DEVICE", "auto")
    if env in ("1", "device", "force"):
        return True
    if env in ("0", "host"):
        return False
    if n_items < _MIN_ITEMS:
        return False
    return accel_platform() == "tpu"


# ---------------------------------------------------------------- compile cost
# Some deployments reach the TPU through high-latency transports where
# XLA executable load/compile costs tens of seconds PER PROCESS and the
# persistent jit cache cannot help (the backend does not serialize
# executables).  Short-lived CLI tools must not pay that blindly: the
# measured cost of standing up the fused mpileup pipeline is cached on
# disk (per box, TTL 6h) and consulted by the dispatch policy; it is
# written by bench warmup and by any tool window that blows its budget.

_COMPILE_COST_PATH = os.environ.get(
    "SAMTPU_COMPILE_COST_CACHE", "/tmp/samtpu_compile_cost.json")
_COMPILE_COST_TTL = 6 * 3600.0


def compile_cost_cached() -> float | None:
    """Measured pipeline stand-up seconds for this box, or None."""
    import json
    import time
    try:
        with open(_COMPILE_COST_PATH) as fh:
            d = json.load(fh)
        if time.time() - float(d["t"]) <= _COMPILE_COST_TTL:
            return float(d["seconds"])
    except Exception:
        pass
    return None


def record_compile_cost(seconds: float) -> None:
    import json
    import time
    try:
        tmp = _COMPILE_COST_PATH + f".{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"seconds": float(seconds), "t": time.time()}, fh)
        os.replace(tmp, _COMPILE_COST_PATH)
    except Exception:
        pass
