"""Live terminal viewer — the interactive front end (Window analog).

The reference's defining loop is a GLFW window with mouse-look, WASD and
live `T`/`R` keys (Source/Engine/Private/Window.cpp:13-65,
Private/Engine.cpp:68-99).  This sandbox has no display server, so the
window is the TERMINAL: frames render as 24-bit-color half-block rows
(two pixels per character cell), and raw-mode stdin feeds the same event
bus GLFW callbacks would (engine.events), driving the stock CameraSystem
— nothing here is viewer-specific camera code.

Keys (mirroring Config.hpp:73-77 bindings where the terminal allows):
  w/a/s/d/space/c  move (forward/left/back/right/up/down)
  arrow keys       look (translated to the CameraSystem's mouse-look)
  t                toggle PT <-> hybrid   (Engine key handler)
  r                reload active pipelines
  1..5             speed presets
  q / Ctrl-C       quit

Usage: python -m steeljax.apps.viewer [scene] --size 128x72 --fps 4
`--frames N --keys t,w,w` runs a scripted session without a tty (CI).
"""

from __future__ import annotations

import argparse
import select
import sys
import time

import numpy as np

# Terminal arrow-key escape tails -> synthetic mouse-look deltas (pixels
# of virtual mouse travel per press; CameraSystem scales by 0.001).
_ARROWS = {"A": (0.0, -80.0), "B": (0.0, 80.0),
           "C": (-80.0, 0.0), "D": (80.0, 0.0)}
_MOVE_KEYS = {"w", "a", "s", "d", " ", "c"}


def frame_to_ansi(frame: np.ndarray, max_cols: int = 160) -> str:
    """Render an (H, W, 3) [0,1] frame as half-block rows (2 px/cell)."""
    img = np.clip(np.asarray(frame) * 255.0, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    if w > max_cols:  # nearest-neighbor fit to the terminal
        step = -(-w // max_cols)
        img = img[::step, ::step]
        h, w = img.shape[:2]
    if h % 2:
        img = img[:-1]
        h -= 1
    top, bot = img[0::2], img[1::2]
    rows = []
    for y in range(h // 2):
        cells = []
        for x in range(w):
            tr, tg, tb = top[y, x]
            br, bg, bb = bot[y, x]
            cells.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                         f"\x1b[48;2;{br};{bg};{bb}m▀")
        rows.append("".join(cells) + "\x1b[0m")
    return "\n".join(rows)


class _RawStdin:
    """Raw-mode stdin as a context manager; no-op without a tty."""

    def __init__(self):
        self.enabled = sys.stdin.isatty()

    def __enter__(self):
        if self.enabled:
            import termios
            import tty
            self._fd = sys.stdin.fileno()
            self._saved = termios.tcgetattr(self._fd)
            tty.setcbreak(self._fd)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import termios
            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._saved)

    def pending_keys(self) -> list[str]:
        """Drain stdin without blocking; returns decoded key names."""
        if not self.enabled:
            return []
        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "\x1b":  # arrow escape: ESC [ A..D
                if select.select([sys.stdin], [], [], 0.01)[0]:
                    if sys.stdin.read(1) == "[" and \
                            select.select([sys.stdin], [], [], 0.01)[0]:
                        keys.append("arrow_" + sys.stdin.read(1))
                        continue
                keys.append("escape")
            else:
                keys.append(ch)
        return keys


def _pump(engine, camera, keys: list[str], mouse_pos: list[float]) -> bool:
    """Feed one frame's key batch into the event bus; False = quit.

    Terminals report presses only (auto-repeat while held), so each
    movement key becomes a one-tick press/release impulse — holding the
    key streams impulses, which is the hold-to-move feel at frame rate."""
    from steeljax.engine.events import EventType, MouseInput

    for key in keys:
        if key in ("q", "escape", "\x03"):
            return False
        if key.startswith("arrow_") and key[-1] in _ARROWS:
            dx, dy = _ARROWS[key[-1]]
            # Mouse-look is gated on the control button being held
            # (Config.hpp:82): press around the synthetic move.
            engine.bus.trigger(EventType.MOUSE_INPUT,
                               MouseInput("right", "press"))
            engine.inject_mouse_move(mouse_pos[0], mouse_pos[1])
            mouse_pos[0] += dx
            mouse_pos[1] += dy
            engine.inject_mouse_move(mouse_pos[0], mouse_pos[1])
            engine.bus.trigger(EventType.MOUSE_INPUT,
                               MouseInput("right", "release"))
        elif key in _MOVE_KEYS:
            name = {" ": "space", "c": "ctrl"}.get(key, key)
            engine.inject_key(name, "press")
        else:
            engine.inject_key(key, "press")
    return True


def _release_moves(engine, keys: list[str]) -> None:
    for key in keys:
        if key in _MOVE_KEYS:
            engine.inject_key({" ": "space", "c": "ctrl"}.get(key, key),
                              "release")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("scene", nargs="?", default="builtin:cornell")
    ap.add_argument("--size", default="128x72")
    ap.add_argument("--mode", choices=("pt", "hybrid"), default="hybrid")
    ap.add_argument("--fps", type=float, default=4.0,
                    help="frame budget (tick pacing only; actual rate is "
                         "whatever the backend renders)")
    ap.add_argument("--frames", type=int, default=0,
                    help="exit after N frames (0 = until q)")
    ap.add_argument("--keys", default="",
                    help="comma-separated scripted key batches, one per "
                         "frame (for headless/demo runs)")
    ap.add_argument("--max-cols", type=int, default=160)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from steeljax.core.config import RenderConfig
    from steeljax.engine.engine import Engine
    from steeljax.engine.systems import CameraSystem

    width, height = (int(v) for v in args.size.split("x"))
    scene = args.scene
    if scene == "builtin:cornell":
        from steeljax.scene.builtin import make_cornell_scene
        scene = make_cornell_scene()
    engine = Engine(scene, width, height,
                    RenderConfig(width=width, height=height,
                                 path_tracing_enabled=(args.mode == "pt")))
    camera = CameraSystem(engine.bus)
    engine.add_system(camera)

    scripted = ([batch.split("+") for batch in args.keys.split(",")]
                if args.keys else None)
    mouse = [0.0, 0.0]
    out = sys.stdout
    frame_budget = 1.0 / max(args.fps, 1e-3)
    n = 0
    with _RawStdin() as stdin:
        out.write("\x1b[2J")  # clear once; home each frame
        last = time.time()
        while True:
            if scripted is not None:
                keys = scripted[n] if n < len(scripted) else []
                keys = [k for k in keys if k]
            else:
                keys = stdin.pending_keys()
            if not _pump(engine, camera, keys, mouse):
                break
            now = time.time()
            frame = engine.tick(now - last)
            last = now
            _release_moves(engine, keys)
            hud = " | ".join(engine.overlay_lines() + [
                f"mode={engine.renderer.mode.name}",
                "wasd/space/c move  arrows look  t toggle  r reload  q quit",
            ])
            out.write("\x1b[H" + frame_to_ansi(frame, args.max_cols)
                      + "\n\x1b[0m\x1b[K" + hud + "\n")
            out.flush()
            n += 1
            if args.frames and n >= args.frames:
                break
            spare = frame_budget - (time.time() - now)
            if spare > 0 and scripted is None:
                time.sleep(spare)
    return 0


if __name__ == "__main__":
    sys.exit(main())
