"""ctypes bindings to the native image decoder (cpp/decode.cpp).

Decode is the host input pipeline's serial bottleneck once the device side is
one fused program (the reference attacked it with DataLoader worker
processes, src/loaders.py:176-304 + neptune.yaml num_workers; our loader
uses threads, data/loader.py _decode_many). These calls go straight to
libjpeg/libpng and hold no Python objects, so the GIL is released for the
whole decode and the thread pool scales with host cores. PIL remains the
fallback when the toolchain or system libraries are unavailable.
"""

import ctypes

import numpy as np

from mapping_tpu.utils.native_lib import NativeLib


def _register(lib):
    lib.decode_probe.restype = ctypes.c_int
    lib.decode_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.decode_image.restype = ctypes.c_int
    lib.decode_image.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.decode_probe_mem.restype = ctypes.c_int
    lib.decode_probe_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.decode_image_mem.restype = ctypes.c_int
    lib.decode_image_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int]


_lib = NativeLib("decode.cpp", "libdecode.so", _register,
                 extra_flags=["-ljpeg", "-lpng"])
build = _lib.build
_load = _lib.load
available = _lib.available

# Allocation guard: a corrupt (or hostile — the daemon decodes request
# bodies) header can claim an absurd size, e.g. 65500x65500 JPEG = 12 GB
# RGB. Past this cap the native path declines and PIL's own
# decompression-bomb handling takes over. ~134 MP >> any dataset tile.
_MAX_PIXELS = 1 << 27


def _plausible(h, w):
    return 0 < h and 0 < w and h * w <= _MAX_PIXELS


def _decode(path, channels):
    lib = _load()
    if lib is None:
        return None
    path_b = str(path).encode()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.decode_probe(path_b, ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    if not _plausible(h.value, w.value):
        return None
    shape = (h.value, w.value, 3) if channels == 3 else (h.value, w.value)
    out = np.empty(shape, np.uint8)
    dh = ctypes.c_int()
    dw = ctypes.c_int()
    rc = lib.decode_image(path_b, out.ctypes.data_as(ctypes.c_char_p),
                          out.nbytes, channels, ctypes.byref(dh),
                          ctypes.byref(dw))
    if rc != 0:
        return None
    if (dh.value, dw.value) != (h.value, w.value):
        # file replaced between probe and decode (loader threads race
        # against dataset re-syncs): the buffer was sized for the OLD
        # geometry — a partial fill would silently feed the model shifted
        # rows + uninitialized memory; decline and let PIL re-read
        return None
    return out


def decode_rgb(path):
    """(H, W, 3) uint8 RGB, or None when the native path can't serve it."""
    return _decode(path, 3)


def decode_gray(path):
    """(H, W) uint8 grayscale, or None when unavailable."""
    return _decode(path, 1)


def decode_rgb_bytes(data):
    """(H, W, 3) uint8 RGB from in-memory JPEG/PNG bytes, or None when the
    native path can't serve it (caller falls back to PIL). Used by the
    serving daemon's HTTP handler threads — request bodies never touch the
    filesystem, and the whole decode runs outside the GIL."""
    lib = _load()
    if lib is None or len(data) < 8:
        return None
    data = bytes(data)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.decode_probe_mem(data, len(data), ctypes.byref(h),
                            ctypes.byref(w)) != 0:
        return None
    if not _plausible(h.value, w.value):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_image_mem(data, len(data),
                              out.ctypes.data_as(ctypes.c_char_p),
                              out.nbytes, 3)
    if rc != 0:
        return None
    return out
