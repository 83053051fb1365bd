"""ctypes binding to the native decode runtime (native/wsdata.cpp).

Loads native/libwsdata.so when present (``make -C native``); the pipeline
falls back to PIL threads otherwise.  The C batch call releases the GIL
and runs its own thread pool, so a whole catalog batch decodes in one
python call.
"""

import ctypes
import pathlib

import numpy as np

_LIB = None
_TRIED = False

_SO_PATH = (pathlib.Path(__file__).resolve().parent.parent.parent /
            "native" / "libwsdata.so")


def _autobuild():
    """Build the .so from source on a cold container (container resets
    wipe gitignored build products; the round-end bench must not
    silently degrade to the PIL fallback).  The Makefile compiles to a
    temp name and renames atomically, so a loader in another process
    can never dlopen a half-written file."""
    import shutil
    import subprocess
    if not (_SO_PATH.parent / "wsdata.cpp").exists() or \
            shutil.which("make") is None:
        return
    try:
        subprocess.run(
            ["make", "-C", str(_SO_PATH.parent)], timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            check=False)
    except (OSError, subprocess.TimeoutExpired):
        pass


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not _SO_PATH.exists():
        _autobuild()
    if not _SO_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.ws_png_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ws_png_probe.restype = ctypes.c_int
        lib.ws_png_decode_gray_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.ws_png_decode_gray_batch.restype = ctypes.c_int
        lib.ws_png_decode_rgby_batch.argtypes = \
            lib.ws_png_decode_gray_batch.argtypes
        lib.ws_png_decode_rgby_batch.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def probe(path) -> tuple:
    lib = _load()
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.ws_png_probe(str(path).encode(), ctypes.byref(h),
                          ctypes.byref(w))
    if rc != 0:
        raise FileNotFoundError(path)
    return h.value, w.value


def _decode_batch(paths, threads, fn_name, channels):
    lib = _load()
    if lib is None or not paths:
        return None
    try:
        h, w = probe(paths[0])
    except FileNotFoundError:
        return None
    if h <= 0 or w <= 0 or h * w > 1 << 28:
        # a corrupt/hostile header can claim absurd dims (libpng's probe
        # only parses IHDR); don't size the batch buffer from it — fall
        # back to PIL, which has its own decompression-bomb guard
        return None
    shape = (len(paths), h, w) if channels == 1 else \
        (len(paths), h, w, channels)
    try:
        out = np.empty(shape, dtype=np.uint8)
    except MemoryError:
        return None
    c_paths = (ctypes.c_char_p * len(paths))(
        *[str(p).encode() for p in paths])
    failures = getattr(lib, fn_name)(
        c_paths, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, threads)
    if failures != 0:
        return None
    return list(out)


def decode_gray_batch(paths, threads: int = 8):
    """Decode same-sized PNGs into a [N, H, W] uint8 array, or None if the
    native path can't serve this batch (caller falls back to PIL)."""
    return _decode_batch(paths, threads, "ws_png_decode_gray_batch", 1)


def decode_rgby_batch(paths, threads: int = 8):
    """Decode same-sized PNGs into [N, H, W, 4] uint8 R,G,B,Y (the
    reference's imread4_u8 layout), or None on fallback."""
    return _decode_batch(paths, threads, "ws_png_decode_rgby_batch", 4)
