"""UI overlay burn-in: rasterize the engine's text bindings into frames.

The reference composites a Dear-ImGui pass with the frame-time/FPS text
onto every presented swapchain image (UIRenderer.cpp:42-69, 108-112);
steeljax's analog draws the Engine.overlay_lines() strings into the
rendered array with a tiny built-in 5x7 bitmap font.  It runs host-side
on the finished frame — like the reference, the overlay is a separate
pass AFTER the scene render, so it never touches the jitted frame
function (no recompiles, no device round-trip).
"""

from __future__ import annotations

import numpy as np

# 5x7 bitmap glyphs ('#' = lit).  Lowercase maps to uppercase; unknown
# characters render as blanks.
_GLYPHS = {
    "A": ["..#..", ".#.#.", "#...#", "#...#", "#####", "#...#", "#...#"],
    "B": ["####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."],
    "C": [".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."],
    "D": ["####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."],
    "E": ["#####", "#....", "#....", "####.", "#....", "#....", "#####"],
    "F": ["#####", "#....", "#....", "####.", "#....", "#....", "#...."],
    "G": [".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."],
    "H": ["#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "I": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "J": ["..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."],
    "K": ["#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "#...#", "####.", "#....", "#....", "#...."],
    "Q": [".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", "#....", ".###.", "....#", "....#", "####."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."],
    "W": ["#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"],
    "X": ["#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"],
    "Y": ["#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
    "0": [".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "2": [".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"],
    "3": [".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."],
    "4": ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."],
    "5": ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."],
    "6": [".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."],
    "7": ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."],
    "8": [".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."],
    "9": [".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."],
    ".": [".....", ".....", ".....", ".....", ".....", ".##..", ".##.."],
    ",": [".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."],
    ":": [".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."],
    "(": ["...#.", "..#..", ".#...", ".#...", ".#...", "..#..", "...#."],
    ")": [".#...", "..#..", "...#.", "...#.", "...#.", "..#..", ".#..."],
    "-": [".....", ".....", ".....", "#####", ".....", ".....", "....."],
    "+": [".....", "..#..", "..#..", "#####", "..#..", "..#..", "....."],
    "/": ["....#", "....#", "...#.", "..#..", ".#...", "#....", "#...."],
    "%": ["##..#", "##..#", "...#.", "..#..", ".#...", "#..##", "#..##"],
    "=": [".....", ".....", "#####", ".....", "#####", ".....", "....."],
    "'": ["..#..", "..#..", ".....", ".....", ".....", ".....", "....."],
    " ": [".....", ".....", ".....", ".....", ".....", ".....", "....."],
}

GLYPH_W, GLYPH_H = 5, 7


def _glyph_mask(ch: str) -> np.ndarray:
    rows = _GLYPHS.get(ch.upper(), _GLYPHS[" "])
    return np.asarray([[c == "#" for c in row] for row in rows], bool)


def render_text_mask(lines: list[str], scale: int = 1,
                     line_spacing: int = 3) -> np.ndarray:
    """(H, W) bool mask of the rasterized text block (1 px letter gap)."""
    if not lines:
        return np.zeros((0, 0), bool)
    width = max(len(ln) for ln in lines) * (GLYPH_W + 1)
    height = len(lines) * (GLYPH_H + line_spacing)
    mask = np.zeros((height, width), bool)
    for li, line in enumerate(lines):
        y = li * (GLYPH_H + line_spacing)
        for ci, ch in enumerate(line):
            x = ci * (GLYPH_W + 1)
            mask[y:y + GLYPH_H, x:x + GLYPH_W] |= _glyph_mask(ch)
    if scale > 1:
        mask = np.repeat(np.repeat(mask, scale, axis=0), scale, axis=1)
    return mask


def burn_overlay(frame: np.ndarray, lines: list[str], origin=(6, 6),
                 scale: int = 1, color=(1.0, 1.0, 1.0),
                 backing: float = 0.65) -> np.ndarray:
    """Draw text into a copy of `frame` ((H, W, 3) float in [0, 1]).

    A dimmed backing rectangle keeps the text readable on bright frames
    (the ImGui window-background analog)."""
    frame = np.array(frame, np.float32, copy=True)
    mask = render_text_mask(lines, scale=scale)
    if mask.size == 0:
        return frame
    y0, x0 = origin
    h = min(mask.shape[0], frame.shape[0] - y0)
    w = min(mask.shape[1], frame.shape[1] - x0)
    if h <= 0 or w <= 0:
        return frame
    pad = 3 * scale
    by0, bx0 = max(y0 - pad, 0), max(x0 - pad, 0)
    by1 = min(y0 + h + pad, frame.shape[0])
    bx1 = min(x0 + w + pad, frame.shape[1])
    frame[by0:by1, bx0:bx1] *= 1.0 - backing
    region = frame[y0:y0 + h, x0:x0 + w]
    m = mask[:h, :w, None]
    frame[y0:y0 + h, x0:x0 + w] = np.where(
        m, np.asarray(color, np.float32), region)
    return frame
