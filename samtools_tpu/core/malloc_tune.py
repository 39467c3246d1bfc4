"""Host allocator tuning for columnar batch workloads.

The pileup-family tools churn many large short-lived numpy buffers
(tens of MB each, released every window).  glibc serves those from
fresh anonymous mmaps, so every buffer re-faults its pages — and on
virtualized hosts a minor fault costs ~10 us, which made kernel time
dominate the pure-host pipeline (observed: 3.2 s of sys time just to
allocate+touch 10 x 128 MB).  Routing large allocations through the
main heap and disabling trim makes pages fault once at the high-water
mark and then be reused.

The reference avoids this class of cost structurally (one bam1_t arena,
records reused: bam_sort.c:3482); for a batch-columnar design the
allocator knob is the equivalent.

Call ``tune()`` once at process start (CLI main, bench, workers).  Set
``SAMTPU_MALLOC=0`` to disable.
"""

from __future__ import annotations

import os

_done = False

# glibc mallopt parameter codes (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4


def tune() -> bool:
    """Apply the allocator tuning; True when applied."""
    global _done
    if _done:
        return True
    if os.environ.get("SAMTPU_MALLOC", "1") in ("0", "off"):
        return False
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok &= libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        ok &= libc.mallopt(_M_MMAP_MAX, 0)
        _done = bool(ok)
    except Exception:
        return False
    return _done
