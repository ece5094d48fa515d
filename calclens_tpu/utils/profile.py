"""Tag-based toggle profiler (reference profile.c / profile.h:23-50).

Same model as the reference: named timers toggled by logProfileTag-style
calls, times relative to a global base time, per-plane step rows appended to
a timing file, and an optional full start/stop time series
(PROFILE_TIMESERIES).  On TPU the analog of per-phase MPI wall times is host
wall-clock around block_until_ready boundaries plus jax.profiler traces; the
`trace` context manager wraps both.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# canonical tag names (reference globalvars.c:7-10)
TAGS = (
    "TOTALTIME", "STEPTIME", "RAYPROP", "SHT", "SHTSOLVE", "MAPSHUFFLE",
    "PARTIO", "RAYIO", "GALIO", "GRIDSEARCH", "RAYBUFF", "RESTART",
    "MG", "DEPOSIT", "INTERP", "INITEND",
)


class Profiler:
    def __init__(self, keep_timeseries=False):
        self.base = time.perf_counter()
        self.total = {}
        self.count = {}
        self._open = {}
        self.keep_timeseries = keep_timeseries
        self.series = []

    def log_tag(self, tag):
        """Toggle: first call starts the timer, second stops and accumulates
        (reference logProfileTag)."""
        now = time.perf_counter() - self.base
        if tag in self._open:
            start = self._open.pop(tag)
            self.total[tag] = self.total.get(tag, 0.0) + (now - start)
            self.count[tag] = self.count.get(tag, 0) + 1
            if self.keep_timeseries:
                self.series.append((tag, start, now))
        else:
            self._open[tag] = now

    @contextmanager
    def __call__(self, tag, device_sync=None):
        """Context manager form; device_sync: object passed to
        jax.block_until_ready before stopping the timer so device work is
        attributed to the right phase."""
        self.log_tag(tag)
        try:
            yield
        finally:
            if device_sync is not None:
                import jax

                jax.block_until_ready(device_sync)
            self.log_tag(tag)

    def get(self, tag):
        return self.total.get(tag, 0.0)

    def report(self):
        width = max((len(t) for t in self.total), default=8)
        lines = [f"{t:<{width}} {self.total[t]:12.6f}s  x{self.count[t]}"
                 for t in sorted(self.total, key=self.total.get, reverse=True)]
        return "\n".join(lines)

    def write(self, path):
        """Per-task `timing` file (reference printProfileInfo)."""
        with open(path, "w") as fp:
            fp.write(self.report() + "\n")

    def write_step_row(self, fp, plane_num, tags=("STEPTIME", "SHT", "RAYPROP",
                                                  "DEPOSIT", "INTERP")):
        """Append one per-plane row (reference printStepTimesProfileTags,
        raytrace.c:54-64)."""
        if plane_num == 0 or fp.tell() == 0:
            fp.write("# plane " + " ".join(tags) + "\n")
        fp.write(f"{plane_num} " +
                 " ".join(f"{self.total.get(t, 0.0):.6f}" for t in tags) + "\n")
        fp.flush()


GLOBAL = Profiler()
log_tag = GLOBAL.log_tag
