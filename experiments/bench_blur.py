"""PIL vs native Gaussian blur: timing + byte-exactness spot check.

The native kernel (native/hostops.cpp gaussian_blur_u8) reimplements
Pillow's GaussianBlur byte-exactly (Gwosdek extended-box radius with
Pillow's float32/double expression mixing; 3 horizontal + 3 vertical
fixed-point box passes, per-pass uint8 quantization) with contiguous
auto-vectorizable passes. Round-4 numbers on this 1-core VM at 1280x720:
PIL 53.7 ms, native 9.2 ms (5.8x). Exactness is pinned by
tests/test_hostops.py::test_gaussian_blur_matches_pil; this harness
reproduces the timing claim.

    env PALLAS_AXON_POOL_IPS= python experiments/bench_blur.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
from PIL import Image, ImageFilter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1280,720", help="W,H")
    p.add_argument("--radius", type=float, default=0.7)
    p.add_argument("--reps", type=int, default=9)
    args = p.parse_args()
    w, h = (int(v) for v in args.size.split(","))

    from maxsquareloss_tpu.data import hostops

    assert hostops.has_gaussian_blur(), "native extension missing blur op"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    pil = Image.fromarray(img)

    def med(fn):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    t_pil = med(lambda: pil.filter(ImageFilter.GaussianBlur(args.radius)))
    t_nat = med(lambda: hostops.gaussian_blur(img, args.radius))

    want = np.asarray(pil.filter(ImageFilter.GaussianBlur(args.radius)))
    exact = bool(np.array_equal(hostops.gaussian_blur(img, args.radius), want))
    print(json.dumps({
        "size": f"{w}x{h}", "radius": args.radius, "reps": args.reps,
        "pil_ms": round(t_pil, 2), "native_ms": round(t_nat, 2),
        "speedup": round(t_pil / t_nat, 2), "byte_exact": exact,
    }))
    assert exact


if __name__ == "__main__":
    main()
