"""Native (C++) runtime components, loaded via ctypes.

The TPU compute path is jax/XLA/Pallas; host-side runtime hot spots live
here.  Currently: the fused photometric augmentation kernel
(``photometric.cpp``) replacing the PIL ColorJitter/AdjustGamma chain of
``nmrf_tpu/data/transforms.py`` (parity target: reference
``nmrf/data/transforms.py:31-155``).

Build model: no pybind11/wheel machinery — the first use compiles the
single translation unit with ``g++ -O3 -shared -fPIC`` into a
content-addressed cache (``~/.cache/nmrf_tpu``), so a source edit
invalidates automatically and read-only package installs still work.  If
no toolchain is available (or ``NMRF_NATIVE=0``), ``load()`` returns None
and every caller falls back to the pure-Python path.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

_SRC = Path(__file__).with_name("photometric.cpp")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = Path(os.environ.get("NMRF_NATIVE_CACHE",
                                Path.home() / ".cache" / "nmrf_tpu"))
    lib = cache / f"photometric-{tag}.so"
    if lib.exists():
        return lib
    cache.mkdir(parents=True, exist_ok=True)
    tmp = lib.with_suffix(f".tmp{os.getpid()}")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(tmp), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        tmp.unlink(missing_ok=True)
        return None
    tmp.replace(lib)  # atomic: concurrent loader workers race safely
    return lib


def load():
    """Return the loaded CDLL, or None (no toolchain / disabled)."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed or os.environ.get("NMRF_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        path = _build()
        if path is None:
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            _failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.nmrf_photometric.argtypes = [
            u8p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            u8p, ctypes.c_int]
        lib.nmrf_photometric.restype = None
        for name in ("nmrf_rgb2hsv", "nmrf_hsv2rgb"):
            fn = getattr(lib, name)
            fn.argtypes = [u8p, u8p, ctypes.c_longlong]
            fn.restype = None
        _lib = lib
        return _lib
