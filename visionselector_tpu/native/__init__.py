"""Native host-side components (C, OpenMP).

The TPU compute path is jax/XLA/Pallas; the host runtime around it — here
the image/video data loader's fused normalize+patchify — is native, matching
the role external native dataloaders play in the reference stack
(SURVEY.md §2.8). Compiled on first use with the system C compiler and
cached next to the source; every caller falls back to the numpy pipeline
when no compiler is available (or VST_NATIVE=0).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "fused_preprocess.c")


def _so_path() -> str:
    # The source hash in the name invalidates stale binaries automatically
    # (mtime comparisons are unreliable after git checkout, which stamps
    # identical times on source and any leftover artifact).
    import hashlib

    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    tag = f"cpython{sys.version_info[0]}{sys.version_info[1]}"
    return os.path.join(os.path.dirname(__file__),
                        f"_fused_preprocess_{tag}_{digest}.so")


def _build() -> str | None:
    so = _so_path()
    if os.path.exists(so):
        return so
    cc = os.environ.get("CC", "cc")
    tmp = f"{so}.tmp{os.getpid()}"
    for extra in (["-fopenmp"], []):  # openmp if supported, else serial
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC] + extra,
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                os.replace(tmp, so)  # atomic: no partially-written dlopen
                return so
        except (OSError, subprocess.TimeoutExpired):
            return None
    return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("VST_NATIVE", "1") == "0":
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        args_common = [
            ctypes.c_long] * 6 + [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.fused_normalize_patchify_u8.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float),
        ] + args_common
        lib.fused_normalize_patchify_u8.restype = None
        lib.fused_normalize_patchify_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float),
        ] + args_common
        lib.fused_normalize_patchify_f64.restype = None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def fused_normalize_patchify(
    frames: np.ndarray,  # [T, H, W, 3] uint8 or float64, contiguous
    patch_size: int,
    temporal_patch_size: int,
    merge_size: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> np.ndarray | None:
    """C path for normalize+patchify. Returns None when unavailable (caller
    falls back to numpy). Output [grid_t*grid_h*grid_w, 3*tp*ps*ps] f32."""
    lib = _load()
    if lib is None:
        return None
    t, h, w, c = frames.shape
    if c != 3 or h % (patch_size * merge_size) or w % (patch_size * merge_size):
        return None
    gt = -(-t // temporal_patch_size)
    n_rows = gt * (h // patch_size) * (w // patch_size)
    out = np.empty((n_rows, 3 * temporal_patch_size * patch_size**2),
                   np.float32)
    meand = np.ascontiguousarray(mean, np.float64)
    stdd = np.ascontiguousarray(std, np.float64)
    common = (
        ctypes.c_long(t), ctypes.c_long(h), ctypes.c_long(w),
        ctypes.c_long(patch_size), ctypes.c_long(temporal_patch_size),
        ctypes.c_long(merge_size),
        meand.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stdd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if frames.dtype == np.uint8:
        fr = np.ascontiguousarray(frames)
        lib.fused_normalize_patchify_u8(
            fr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *common)
    elif frames.dtype == np.float64:
        fr = np.ascontiguousarray(frames)
        lib.fused_normalize_patchify_f64(
            fr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *common)
    else:
        return None
    return out
