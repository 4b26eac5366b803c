"""Shared loader for the C++ kernels under cpp/ (one compile recipe, lazy
build-on-first-use, per-library caching). Users: utils/native.py (RLE) and
utils/native_gbm.py (histogram GBM)."""

import ctypes
import os
import subprocess
import threading

_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cpp")


class NativeLib:
    """Lazily compiled + loaded shared library.

    register(lib) is called once after a successful CDLL load to declare
    argtypes/restypes.
    """

    def __init__(self, src_name: str, so_name: str, register,
                 extra_flags=()):
        self.src = os.path.join(_CPP_DIR, src_name)
        self.so = os.path.join(_CPP_DIR, so_name)
        self._register = register
        self._extra_flags = list(extra_flags)  # e.g. -ljpeg for decode.cpp
        self._lib = None
        self._tried = False
        # first use can come from the loader's decode THREAD POOL: without a
        # lock two threads would race g++ into the same .so
        self._lock = threading.Lock()

    def build(self, force=False) -> bool:
        """Compile the source to a shared library. Returns True on success."""
        with self._lock:
            return self._build_locked(force)

    def _build_locked(self, force=False) -> bool:
        if not os.path.exists(self.src):
            return False
        if force or not os.path.exists(self.so) or \
                os.path.getmtime(self.so) < os.path.getmtime(self.src):
            tmp = self.so + ".tmp"
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     self.src, "-o", tmp] + self._extra_flags,
                    check=True, capture_output=True)
                os.replace(tmp, self.so)
            except Exception:
                return False
        self._tried = False
        self._lib = None
        return self._load_locked() is not None

    def load(self):
        if self._lib is not None or self._tried:
            return self._lib
        with self._lock:
            return self._load_locked()

    def _load_locked(self):
        if self._lib is not None or self._tried:
            return self._lib
        self._tried = True
        if not os.path.exists(self.so) or \
                (os.path.exists(self.src)
                 and os.path.getmtime(self.so) < os.path.getmtime(self.src)):
            # .so binaries are not committed — build on first use (fresh
            # clones would otherwise silently lose the C++ fast paths)
            self._build_locked()
            return self._lib
        try:
            lib = ctypes.CDLL(self.so)
        except OSError:
            return None
        self._register(lib)
        self._lib = lib
        return self._lib

    def available(self) -> bool:
        return self.load() is not None
