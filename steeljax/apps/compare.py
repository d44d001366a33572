"""Image comparison tool: per-pixel RMSE between renders.

The quantitative form of the reference's visual A/B workflow (the `T`
toggle + README gallery pairs, SURVEY.md §4) and the BASELINE.md fidelity
gate ("per-pixel RMSE < 1% vs converged reference at equal spp").

    python -m steeljax.apps.compare a.png b.png [--threshold 0.01]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.max() > 1.5:
        a = a / 255.0
    if b.max() > 1.5:
        b = b / 255.0
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return float(np.sqrt(np.mean((a - b) ** 2)))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("image_a")
    parser.add_argument("image_b")
    parser.add_argument("--threshold", type=float, default=0.01)
    args = parser.parse_args(argv)

    from steeljax.io.image import load_ldr

    a = load_ldr(args.image_a)[..., :3]
    b = load_ldr(args.image_b)[..., :3]
    value = rmse(a, b)
    passed = value < args.threshold
    print(json.dumps({"rmse": value, "threshold": args.threshold,
                      "pass": passed}))
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
