"""Engine shell: event bus, systems, headless frame loop.

The L7/L6 layers of the reference (Engine static orchestrator + Systems,
SURVEY.md §1) without a window: input arrives as injected events, frames
render to arrays, and the loop is driven by a virtual clock so scripted
scenarios (TestSystem) are deterministic.
"""

from steeljax.engine.events import EventBus, EventType  # noqa: F401
from steeljax.engine.engine import Engine  # noqa: F401
from steeljax.engine.systems import (  # noqa: F401
    CameraSystem, System, TestSystem)
