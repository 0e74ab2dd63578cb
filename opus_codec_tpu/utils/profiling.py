"""Per-stage timing and device-trace harness.

The reference's profiling story is the compile-gated SILK_TIC_TOC timer
macros (/root/reference/opus/silk/debug.h:31-75, debug.c:84-174: named
timers with min/sum/count and a silk_TimerSave dump).  The TPU-native
equivalent here is:

- ``StageTimer``: named TIC/TOC wall-clock timers.  For device work the
  caller is responsible for timing *completed* work — pass
  ``block=result`` (any jax array/pytree) to ``toc`` and the timer calls
  ``block_until_ready`` before reading the clock.
- ``device_trace``: a ``jax.profiler`` trace context for XLA-level
  inspection (op fusion, HBM traffic), the analogue of the reference's
  DEBUG_STORE_DATA signal dumps.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Named stage timers (silk/debug.h TIC/TOC analogue).

    >>> t = StageTimer()
    >>> with t.stage("mdct"):
    ...     work()
    >>> t.report()["mdct"]["count"]
    1
    """

    def __init__(self):
        self._sum = defaultdict(float)
        self._min = {}
        self._count = defaultdict(int)
        self._open = {}

    def tic(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def toc(self, name: str, block=None) -> float:
        """Stop timer ``name``; if ``block`` is given, wait for device
        completion first (the honest way to time jitted work)."""
        if block is not None:
            import jax
            jax.block_until_ready(block)
        t0 = self._open.pop(name)
        dt = time.perf_counter() - t0
        self._sum[name] += dt
        self._count[name] += 1
        prev = self._min.get(name)
        self._min[name] = dt if prev is None else min(prev, dt)
        return dt

    @contextlib.contextmanager
    def stage(self, name: str, block_fn=None):
        self.tic(name)
        try:
            yield self
        finally:
            self.toc(name, block=block_fn() if block_fn else None)

    def report(self) -> Dict[str, Dict[str, float]]:
        """silk_TimerSave analogue: {name: {sum, min, count, mean}}."""
        out = {}
        for name, s in self._sum.items():
            c = self._count[name]
            out[name] = {"sum": s, "min": self._min[name],
                         "count": c, "mean": s / c}
        return out

    def reset(self) -> None:
        self._sum.clear()
        self._min.clear()
        self._count.clear()
        self._open.clear()

    def format_report(self) -> str:
        rows = sorted(self.report().items(),
                      key=lambda kv: -kv[1]["sum"])
        lines = [f"{'stage':<28} {'count':>6} {'sum_ms':>10} "
                 f"{'mean_ms':>10} {'min_ms':>10}"]
        for name, r in rows:
            lines.append(
                f"{name:<28} {r['count']:>6d} {r['sum'] * 1e3:>10.3f} "
                f"{r['mean'] * 1e3:>10.3f} {r['min'] * 1e3:>10.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None):
    """jax.profiler trace context; no-op when logdir is None so call
    sites can leave tracing permanently wired."""
    if logdir is None:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
