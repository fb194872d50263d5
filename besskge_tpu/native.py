"""ctypes bindings for the native (C++) host-side hot loops.

Builds ``csrc/bess_host.cpp`` into a shared library on first use (analog of
the reference's Makefile-built PopART plugin loaded via ``ctypes`` at import,
``besskge/__init__.py:10-37``) and exposes:

* :func:`assemble_hrt` — shard-pair (h, r, t) gather with the tail
  pre-transpose for the AllToAll;
* :func:`random_negatives` — balanced negative drawing (pcg32);
* :func:`rigid_take` — padded-epoch triple selection + mask.

All functions degrade to ``None``/unavailable if no C++ toolchain is present;
the samplers fall back to their numpy implementations.
"""

from __future__ import annotations

import ctypes
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "assemble_hrt", "random_negatives", "rigid_take"]

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "bess_host.cpp"
_LIB_DIR = Path(__file__).resolve().parent / "_native_build"
_LIB = _LIB_DIR / "libbess_host.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    _LIB_DIR.mkdir(exist_ok=True)
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        cxx = sysconfig.get_config_var("CXX") or "g++"
        cmd = (
            cxx.split()[:1]
            + ["-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
        )
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.bess_assemble_hrt.argtypes = [
        _i32p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _i32p, _i32p, _i32p,
    ]
    lib.bess_assemble_hrt_flat.argtypes = [
        _i32p, _i64p, ctypes.c_int64, _i32p, _i32p, _i32p,
    ]
    lib.bess_random_negatives.argtypes = [
        ctypes.c_uint64, _i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _i32p,
    ]
    lib.bess_rigid_take.argtypes = [
        _i64p, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _i64p, _u8p,
    ]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build()
                _tried = True
    return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _get() is not None


def assemble_hrt(
    triples: np.ndarray, sample_idx: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Gather (head, relation, tail) for a batch; ``None`` if unavailable.

    For 4-D ``sample_idx`` (bps, S, S, ppp) — ht_shardpair — the returned
    tails are pre-transposed (shard_h <-> shard_t). 3-D input returns plain
    gathers.
    """
    lib = _get()
    if lib is None:
        return None
    triples = np.ascontiguousarray(triples, np.int32)
    sample_idx = np.ascontiguousarray(sample_idx, np.int64)
    head = np.empty(sample_idx.shape, np.int32)
    rel = np.empty(sample_idx.shape, np.int32)
    tail = np.empty(sample_idx.shape, np.int32)
    if sample_idx.ndim == 4:
        bps, s, s2, ppp = sample_idx.shape
        if s != s2:
            return None
        lib.bess_assemble_hrt(triples, sample_idx, bps, s, ppp, head, rel, tail)
    else:
        lib.bess_assemble_hrt_flat(
            triples, sample_idx.reshape(-1), sample_idx.size,
            head.reshape(-1), rel.reshape(-1), tail.reshape(-1),
        )
    return head, rel, tail


def random_negatives(
    seed: int, shard_counts: np.ndarray, bps: int, n_shard: int, b: int,
    n_negative: int,
) -> Optional[np.ndarray]:
    """(bps, S_src, S_dest, B, n_neg) balanced local ids; ``None`` if n/a."""
    lib = _get()
    if lib is None:
        return None
    out = np.empty((bps, n_shard, n_shard, b, n_negative), np.int32)
    lib.bess_random_negatives(
        np.uint64(seed & (2**64 - 1)),
        np.ascontiguousarray(shard_counts, np.int64),
        bps, n_shard, b, n_negative, out,
    )
    return out


def rigid_take(
    padded_idx: np.ndarray, counts: np.ndarray, order: np.ndarray,
    bps: int, ppp: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(take, mask) for a Rigid batch; ``None`` if unavailable."""
    lib = _get()
    if lib is None or padded_idx.ndim != 3:
        return None
    s = padded_idx.shape[0]
    take = np.empty((bps, s, s, ppp), np.int64)
    mask = np.empty((bps, s, s, ppp), np.uint8)
    lib.bess_rigid_take(
        np.ascontiguousarray(padded_idx, np.int64),
        np.ascontiguousarray(counts, np.int64),
        np.ascontiguousarray(order, np.int64),
        bps, s, ppp, padded_idx.shape[-1], take, mask,
    )
    return take, mask.astype(bool)
