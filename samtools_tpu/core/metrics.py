"""Per-stage timing / throughput counters and leveled logging.

The reference has no tracing at all — observability is limited to
``hts_log_*`` levels driven by ``--verbosity`` (sam_opts.h:48) and
ad-hoc stderr notes.  SURVEY §5 assigns the TPU build per-kernel timing
plus reads/s and columns/s counters (they are the BASELINE metric), so
this module provides both:

* ``log(level, component, fmt)`` — htslib-style leveled stderr lines
  (``[W::component] message``), gated by ``--verbosity`` (default 3 =
  warnings, like hts_verbose).
* ``stage(name, items=, unit=)`` — a context manager accumulating wall
  time and item counts per pipeline stage (decode, expand, device,
  format, write, ...).  At tool exit the CLI prints a breakdown when
  verbosity >= 4 (debug) or SAMTPU_METRICS=1.

Counters are process-global and cheap (two dict updates per stage
enter/exit); tools and kernels instrument unconditionally.
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

# hts_verbose levels: 0 quiet, 1 error, 2 warning(=error in htslib CLI
# mapping), 3 warning, 4 info+debug metrics, 5+ trace
_VERBOSITY = 3
_LEVEL_CHAR = {1: "E", 2: "W", 3: "W", 4: "I", 5: "D"}

# ordered stage registry: name -> [seconds, items, unit, calls]
_STAGES: dict[str, list] = {}


def set_verbosity(level: int) -> None:
    global _VERBOSITY
    _VERBOSITY = level


def verbosity() -> int:
    return _VERBOSITY


def metrics_enabled() -> bool:
    return _VERBOSITY >= 4 or os.environ.get("SAMTPU_METRICS", "") == "1"


def log(level: int, component: str, fmt: str, *args) -> None:
    """hts_log analog: ``[X::component] message`` on stderr when the
    global verbosity admits the level."""
    if level > _VERBOSITY:
        return
    msg = (fmt % args) if args else fmt
    c = _LEVEL_CHAR.get(level, "D")
    sys.stderr.write(f"[{c}::{component}] {msg}\n")


@contextmanager
def stage(name: str, items: int = 0, unit: str = "items"):
    """Accumulate wall time (and optional item count) under ``name``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _STAGES.get(name)
        if s is None:
            _STAGES[name] = [dt, items, unit, 1]
        else:
            s[0] += dt
            s[1] += items
            s[3] += 1


def add(name: str, seconds: float, items: int = 0,
        unit: str = "items") -> None:
    """Record a stage measured externally."""
    s = _STAGES.get(name)
    if s is None:
        _STAGES[name] = [seconds, items, unit, 1]
    else:
        s[0] += seconds
        s[1] += items
        s[3] += 1


def counters() -> dict[str, tuple[float, int, str, int]]:
    return {k: tuple(v) for k, v in _STAGES.items()}


def reset() -> None:
    _STAGES.clear()


def _human(n: float) -> str:
    for div, suf in ((1e9, "G"), (1e6, "M"), (1e3, "k")):
        if n >= div:
            return f"{n / div:.2f}{suf}"
    return f"{n:.0f}"


def report(tool: str, out=None) -> None:
    """Print the stage breakdown (verbosity>=4 or SAMTPU_METRICS=1)."""
    if not _STAGES or not metrics_enabled():
        return
    out = out or sys.stderr
    total = sum(s[0] for s in _STAGES.values())
    out.write(f"[M::{tool}] stage breakdown "
              f"(total instrumented {total:.3f}s):\n")
    for name, (sec, items, unit, calls) in _STAGES.items():
        line = f"[M::{tool}]   {name:<22} {sec:8.3f}s  x{calls}"
        if items:
            line += f"  {_human(items)} {unit}  {_human(items / sec if sec > 0 else 0)} {unit}/s"
        out.write(line + "\n")
    out.flush()
