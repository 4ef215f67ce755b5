"""Tracing/profiling hooks.

The reference's profiling is printf wall-clock timers per stage
(test/test.cpp:49-59).  Here: jax.profiler traces (xprof/perfetto),
named scopes on each pipeline stage (see parallel/pipeline.py), and a
stage timer that reports frames/s and real-time factor.
"""

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace viewable in xprof/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with audio-relative rates, printed as one
    JSON line per stage (the structured version of test.cpp's printfs)."""

    def __init__(self, audio_seconds, log=print):
        self.audio_seconds = audio_seconds
        self.log = log
        self.records = {}

    @contextlib.contextmanager
    def stage(self, name, frames=None):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        rec = {"stage": name, "ms": round(dt * 1000, 2),
               "rtf": round(self.audio_seconds / dt, 2) if dt else None}
        if frames:
            rec["frames_per_s"] = round(frames / dt, 1)
        self.records[name] = rec
        self.log(json.dumps(rec))
