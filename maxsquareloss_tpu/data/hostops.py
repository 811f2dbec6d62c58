"""Python wrappers for the native host-ops extension (native/hostops.cpp).

Fused PNG decode + LUT remap / caffe normalization in C++ over libpng, GIL
released — the loader's worker threads scale across cores. Falls back to
the PIL/numpy path transparently when the extension isn't built; build with
``make -C native``.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np

_ext = None


def _load():
    global _ext
    if _ext is not None:
        return _ext
    try:
        from maxsquareloss_tpu.data import _hostops  # type: ignore

        _ext = _hostops
    except ImportError:
        # best-effort build from source (g++ + libpng are baked in)
        native = Path(__file__).resolve().parents[2] / "native"
        if (native / "hostops.cpp").exists():
            try:
                subprocess.run(
                    ["make", "-C", str(native)], check=True,
                    capture_output=True, timeout=120,
                )
                from maxsquareloss_tpu.data import _hostops  # type: ignore

                _ext = _hostops
            except Exception:
                _ext = False
        else:
            _ext = False
    return _ext


def available() -> bool:
    return bool(_load())


def decode_png(data: bytes, expand_rgb: bool = True) -> np.ndarray:
    """PNG bytes → numpy array (H, W[, C]); 8-bit RGB when expand_rgb."""
    ext = _load()
    buf, h, w, c, depth = ext.decode_png(data, expand_rgb)
    dtype = np.uint16 if depth == 16 else np.uint8
    arr = np.frombuffer(buf, dtype=dtype).reshape(
        (h, w, c) if c > 1 else (h, w)
    )
    return arr


def decode_remap(data: bytes, lut: np.ndarray) -> np.ndarray:
    """Label PNG bytes + int32 LUT → remapped int32 (H, W) in one pass."""
    ext = _load()
    lut = np.ascontiguousarray(lut, dtype=np.int32)
    buf, h, w = ext.decode_remap(data, lut.tobytes())
    return np.frombuffer(buf, dtype=np.int32).reshape(h, w)


def decode_normalize_bgr(data: bytes, mean_bgr) -> np.ndarray:
    """RGB PNG bytes → float32 (H, W, 3) BGR − mean (caffe path), one pass."""
    ext = _load()
    m = np.asarray(mean_bgr, dtype=np.float32)
    buf, h, w = ext.decode_normalize_bgr(data, float(m[0]), float(m[1]), float(m[2]))
    return np.frombuffer(buf, dtype=np.float32).reshape(h, w, 3)


def has_gaussian_blur() -> bool:
    """True when the loaded extension carries the round-4 blur op (a stale
    pre-round-4 .so may not — fall back to PIL then)."""
    ext = _load()
    return bool(ext) and hasattr(ext, "gaussian_blur")


def gaussian_blur(arr: np.ndarray, radius: float) -> np.ndarray:
    """uint8 (H, W[, C]) → PIL-byte-exact GaussianBlur(radius).

    Pillow's blur reverse-engineered to byte-exactness (native/hostops.cpp:
    Gwosdek extended-box radius with Pillow's float32/double expression
    mixing, 3 horizontal + 3 vertical fixed-point box passes, per-pass uint8
    quantization) and rewritten with contiguous vectorizable passes:
    ~5.8x faster than PIL at 1280x720 (9.2 vs 53.7 ms on this host).
    Exactness pinned by tests/test_hostops.py::test_gaussian_blur_matches_pil.
    """
    ext = _load()
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    out = ext.gaussian_blur(arr.tobytes(), h, w, c, float(radius))
    return np.frombuffer(out, dtype=np.uint8).reshape(arr.shape)
