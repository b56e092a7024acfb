"""Profiling helpers: wall-clock timing + jax.profiler traces.

The reference wraps the whole training entry in cProfile
(``src/util/timing.py:10-33``); here the equivalents are (a) a lightweight
section timer that reports wall-clock per phase, and (b) an opt-in
``jax.profiler`` trace capturing device timelines/HLO for roofline work.
"""

from __future__ import annotations

import contextlib
import time


class SectionTimer:
    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.sections.values()) or 1.0
        lines = [f"{'section':<30}{'seconds':>10}{'share':>8}"]
        for name, secs in sorted(
            self.sections.items(), key=lambda kv: -kv[1]
        ):
            lines.append(f"{name:<30}{secs:>10.3f}{secs / total:>7.1%}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace (TensorBoard-viewable) when ``log_dir``
    is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall-clock seconds of a blocking call (block_until_ready on
    array outputs)."""
    import jax

    def run():
        out = fn(*args)
        jax.block_until_ready(out)

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
