"""Image IO: LDR via PIL, Radiance .hdr in pure numpy, PNG output.

Replaces the reference's stb_image wrapper
(Source/Engine/Filesystem/Private/ImageLoader.cpp:1-103).  LDR images load
as (H, W, 4) uint8 (values are raw/unorm — sRGB decode happens in shading
code exactly like the reference's Unorm formats); HDR images load as
(H, W, 3) float32.
"""

from __future__ import annotations

import io as _io
from pathlib import Path

import numpy as np


def load_ldr(source: str | Path | bytes) -> np.ndarray:
    """Load an LDR image to (H, W, 4) uint8 RGBA."""
    from PIL import Image

    if isinstance(source, bytes):
        img = Image.open(_io.BytesIO(source))
    else:
        img = Image.open(source)
    img = img.convert("RGBA")
    return np.asarray(img, np.uint8)


def load_hdr(path: str | Path) -> np.ndarray:
    """Radiance RGBE (.hdr) loader -> (H, W, 3) float32 linear."""
    data = Path(path).read_bytes()
    # Header ends with an empty line; next line is the resolution spec.
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("invalid radiance file: no header terminator")
    header = data[:pos].decode("ascii", "replace")
    if "32-bit_rle_rgbe" not in header and not header.startswith("#?"):
        raise ValueError("not a radiance RGBE file")
    rest = data[pos + 2:]
    nl = rest.find(b"\n")
    dims = rest[:nl].decode("ascii").split()
    if dims[0] != "-Y" or dims[2] != "+X":
        raise ValueError(f"unsupported radiance orientation {dims}")
    height, width = int(dims[1]), int(dims[3])
    payload = rest[nl + 1:]

    rgbe = np.zeros((height, width, 4), np.uint8)
    offset = 0
    buf = np.frombuffer(payload, np.uint8)
    for y in range(height):
        if (offset + 4 <= len(buf) and buf[offset] == 2 and buf[offset + 1] == 2
                and ((int(buf[offset + 2]) << 8) | int(buf[offset + 3])) == width):
            # Adaptive RLE: four channel-planes per scanline.
            offset += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(buf[offset]); offset += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = buf[offset]
                        offset += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, c] = buf[offset:offset + count]
                        offset += count
                        x += count
        else:
            # Flat scanline.
            flat = buf[offset:offset + width * 4].reshape(width, 4)
            rgbe[y] = flat
            offset += width * 4

    exponent = rgbe[..., 3].astype(np.int32)
    scale = np.where(exponent == 0, 0.0,
                     np.ldexp(1.0, exponent - 136)).astype(np.float32)
    rgb = (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None]
    rgb[exponent == 0] = 0.0
    return rgb


def write_png(path: str | Path, image: np.ndarray) -> None:
    """Write an (H, W, 3|4) image; float inputs are clamped from [0,1]."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(str(path))
