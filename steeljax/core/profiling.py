"""Tracing/profiling hooks.

The reference embeds easy_profiler blocks and opens a socket for an
external GUI (main.cpp:5-6, EASY_FUNCTION in 16 files — SURVEY.md §5).
The TPU equivalents: `jax.profiler.start_server` for live Perfetto
attachment, `jax.profiler.trace` for on-disk traces, and `named_scope`
annotations so render stages show up in the HLO timeline; XLA op-level
profiles replace the GPU timestamp queries the reference never had.
"""

from __future__ import annotations

import contextlib
import time


def start_profiler_server(port: int = 9012):
    """Live profiling endpoint (easy_profiler's startListen analog)."""
    import jax
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for `perfetto`/TensorBoard."""
    import jax
    with jax.profiler.trace(log_dir):
        yield


def named_scope(name: str):
    """EASY_BLOCK analog: annotates ops for the trace viewer."""
    import jax
    return jax.named_scope(name)


class FrameTimer:
    """The ImGui frame-time overlay's data source
    (UIRenderer.cpp:108-112): exponential moving average of frame time."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._last = None
        self.frame_time = 0.0

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.frame_time = (self.smoothing * self.frame_time
                               + (1.0 - self.smoothing) * dt
                               if self.frame_time else dt)
        self._last = now
        return self.frame_time

    @property
    def fps(self) -> float:
        return 1.0 / self.frame_time if self.frame_time else 0.0

    def overlay_text(self) -> str:
        return (f"Frame time: {self.frame_time * 1e3:.2f} ms "
                f"({self.fps:.1f} FPS)")
