"""ctypes bindings to the native (C++) host runtime in ``runtime/``.

The reference's native surface lived entirely in third-party libraries
(SURVEY.md §2.2); here the framework owns its host-native pieces: the
knapsack DP solver (reference ``utils.py:466-510``) and a WAV reader
(the file-loading half of reference ``utils.py:320``).

The shared library is built on demand with ``make`` (g++; no pybind11 in this
image, so the ABI is plain C + ctypes).  Every native entry point has a pure
Python/NumPy fallback, so nothing here is load-bearing for correctness — only
for host-side speed.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
from functools import lru_cache

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "build", "libgoalnet_runtime.so")


@lru_cache(maxsize=1)
def _load_library():
    """Build (if needed) and load the runtime library; None when unavailable."""
    if not os.path.exists(_LIB_PATH):
        if os.environ.get("GOALNET_NO_NATIVE") or not shutil.which("make"):
            return None
        try:
            subprocess.run(
                ["make", "-C", _RUNTIME_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.goalnet_knapsack.restype = ctypes.c_int32
    lib.goalnet_knapsack.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.goalnet_summarize.restype = ctypes.c_int32
    lib.goalnet_summarize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.goalnet_wav_info.restype = ctypes.c_int
    lib.goalnet_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.goalnet_wav_read.restype = ctypes.c_int64
    lib.goalnet_wav_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    return lib


def native_knapsack_available() -> bool:
    return _load_library() is not None


def knapsack_native(values: np.ndarray, int_weights: np.ndarray, int_capacity: int) -> list[int]:
    """C++ DP + reference-exact traceback (see ``runtime/knapsack.cc``)."""
    lib = _load_library()
    assert lib is not None, "native runtime not built"
    values = np.ascontiguousarray(values, dtype=np.float64)
    weights = np.ascontiguousarray(int_weights, dtype=np.int64)
    n = len(values)
    out = np.empty((n,), dtype=np.int32)
    count = lib.goalnet_knapsack(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int32(n),
        np.int64(int_capacity),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:count].tolist()


def wav_read_native(path: str) -> tuple[np.ndarray, int] | None:
    """Read a WAV file to (mono float32 samples, sample_rate); None on failure."""
    lib = _load_library()
    if lib is None:
        return None
    info = np.zeros((2,), dtype=np.int64)
    rc = lib.goalnet_wav_info(path.encode(), info.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0 or info[1] <= 0:
        return None
    out = np.empty((int(info[1]),), dtype=np.float32)
    n = lib.goalnet_wav_read(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), np.int64(len(out)))
    if n < 0:
        return None
    return out, int(info[0])


def summarize_native(
    importances: np.ndarray,
    intervals: np.ndarray,
    skip_frames: int,
    full_n_frames: int,
    summary_ratio: float,
    inclusive_mask: bool,
) -> tuple[list[int], np.ndarray] | None:
    """Whole postprocess (round->expand->clip stats->knapsack->mask) in ONE
    native call (``runtime/postprocess.cc``); None when the library is
    unavailable.  Semantics identical to ``pipeline.summarize`` (tested)."""
    lib = _load_library()
    if lib is None or not hasattr(lib, "goalnet_summarize"):
        return None
    imp = np.ascontiguousarray(np.asarray(importances).reshape(-1), dtype=np.float32)
    iv = np.ascontiguousarray(np.asarray(intervals, dtype=np.int64).reshape(-1, 2))
    mask = np.zeros((full_n_frames,), dtype=np.uint8)
    selected = np.empty((max(len(iv), 1),), dtype=np.int32)
    count = lib.goalnet_summarize(
        imp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(len(imp)),
        iv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int32(len(iv)),
        np.int32(skip_frames),
        np.int64(full_n_frames),
        float(summary_ratio),
        np.int32(1 if inclusive_mask else 0),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        selected.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if count < 0:
        return None
    return selected[:count].tolist(), mask
