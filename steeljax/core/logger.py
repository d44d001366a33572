"""Logging: leveled stdout macros + throttled progress line.

Parity with Source/Utils/Logger.hpp:1-43 / Private/Logger.cpp: LogE/W/I/D
stream macros and the ProgressLogger used by the GI bake
(GlobalIllumination.cpp:208-236) — a carriage-return percent line printed
at most every `min_interval` seconds.
"""

from __future__ import annotations

import sys
import time

_LEVELS = {"E": 40, "W": 30, "I": 20, "D": 10}
_threshold = 20


def set_level(level: str) -> None:
    global _threshold
    _threshold = _LEVELS[level]


def _log(level: str, *parts) -> None:
    if _LEVELS[level] >= _threshold:
        print(f"[{level}]", *parts,
              file=sys.stderr if level == "E" else sys.stdout)


def log_e(*parts) -> None:
    _log("E", *parts)


def log_w(*parts) -> None:
    _log("W", *parts)


def log_i(*parts) -> None:
    _log("I", *parts)


def log_d(*parts) -> None:
    _log("D", *parts)


class ProgressLogger:
    """Throttled `\\r`-style percent line (Logger.cpp:13-39)."""

    def __init__(self, label: str, total: int,
                 min_interval: float = 0.5, stream=None):
        self.label = label
        self.total = max(total, 1)
        self.min_interval = min_interval
        self.stream = stream or sys.stdout
        self._last_emit = 0.0
        self._done = False

    def update(self, current: int) -> None:
        now = time.monotonic()
        if now - self._last_emit < self.min_interval and \
                current < self.total:
            return
        self._last_emit = now
        percent = 100.0 * current / self.total
        print(f"\r{self.label}: {percent:.0f}%", end="",
              file=self.stream, flush=True)

    def finish(self) -> None:
        if not self._done:
            print(f"\r{self.label}: 100%", file=self.stream, flush=True)
            self._done = True
