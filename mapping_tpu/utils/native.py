"""ctypes bindings to the C++ RLE kernels (cpp/rle.cpp).

The numpy implementations in ops/rle.py are the reference/oracle; the C++
path accelerates the per-annotation hot loops (string codec, RLE IoU) that
pycocotools implemented in C for the same reason. Built lazily via
`build()`; all callers fall back to numpy when unavailable.
"""

import ctypes

import numpy as np

from mapping_tpu.utils.native_lib import NativeLib


def _register(lib):
    lib.rle_counts_to_string.restype = ctypes.c_long
    lib.rle_counts_to_string.argtypes = [
        ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_char_p]
    lib.rle_string_to_counts.restype = ctypes.c_long
    lib.rle_string_to_counts.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
    lib.rle_iou_single.restype = ctypes.c_double
    lib.rle_iou_single.argtypes = [
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_int]
    lib.rle_instances.restype = ctypes.c_long
    lib.rle_instances.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double)]


_lib = NativeLib("rle.cpp", "librle.so", _register)
build = _lib.build
_load = _lib.load
available = _lib.available


def counts_to_string(counts):
    lib = _load()
    counts = [int(c) for c in counts]
    n = len(counts)
    arr = (ctypes.c_long * n)(*counts)
    buf = ctypes.create_string_buffer(n * 12 + 16)
    m = lib.rle_counts_to_string(arr, n, buf)
    return buf.raw[:m]


def string_to_counts(s):
    lib = _load()
    n = len(s)
    out = (ctypes.c_long * (n + 1))()
    m = lib.rle_string_to_counts(s, n, out)
    return [out[i] for i in range(m)]


def rle_instances(labels, n_instances):
    """Labeled int32 (H, W) map -> per-instance (counts_bytes, bbox) in one
    C++ pass (cpp/rle.cpp rle_instances). Returns list of n_instances
    (bytes, [x, y, w, h]) tuples."""
    import numpy as np

    lib = _load()
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = labels.shape
    cap = max(1 << 16, 24 * (h * w // 2 + n_instances * 8))
    # the C side pre-checks capacity CONSERVATIVELY (13 bytes/count upper
    # bound, far above the delta-coded typical 1-2): a pathologically
    # fragmented map can be rejected at a cap its actual encoding would
    # fit, so grow and retry up to the true worst case (sum of run counts
    # is <= 2*h*w + 2*n, 13 bytes each) instead of failing the pass
    hard = 13 * (2 * h * w + 2 * n_instances) + 16 * (n_instances + 1)
    while True:
        buf = ctypes.create_string_buffer(cap)
        offsets = (ctypes.c_long * (n_instances + 1))()
        bbox = (ctypes.c_double * (n_instances * 4))()
        used = lib.rle_instances(
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            h, w, n_instances, buf, cap, offsets, bbox)
        if used >= 0:
            break
        if cap >= hard:
            raise MemoryError("rle_instances output buffer too small")
        cap = min(cap * 4, hard)
    out = []
    for i in range(n_instances):
        counts = buf.raw[offsets[i]:offsets[i + 1]]
        out.append((counts, [bbox[4 * i], bbox[4 * i + 1],
                             bbox[4 * i + 2], bbox[4 * i + 3]]))
    return out


class RleHandle:
    """One RLE's decoded counts pinned as a ctypes array so repeated
    rle_iou_single calls (the NMS hot loop) skip the per-call decode +
    marshal; `area` is the foreground pixel count (sum of odd runs)."""

    __slots__ = ("arr", "n", "area")

    def __init__(self, counts_bytes):
        lib = _load()
        nb = len(counts_bytes)
        out = (ctypes.c_long * (nb + 1))()
        self.n = lib.rle_string_to_counts(counts_bytes, nb, out)
        self.arr = out
        # vectorized view over the ctypes buffer: one handle is built per
        # instance (thousands per image on the scoring path), and a Python
        # generator over per-item ctypes getters costs more than the
        # suppression loop this fast path exists for
        runs = np.frombuffer(out, dtype=np.dtype(ctypes.c_long),
                             count=self.n)
        self.area = int(runs[1::2].sum())


def rle_iou_pair(a: "RleHandle", b: "RleHandle") -> float:
    """Exact (non-crowd) IoU between two RleHandles."""
    return _load().rle_iou_single(a.arr, a.n, b.arr, b.n, 0)


def rle_iou(dt_rles, gt_rles, iscrowd):
    import numpy as np

    lib = _load()
    nd, ng = len(dt_rles), len(gt_rles)
    out = np.zeros((nd, ng))
    if nd == 0 or ng == 0:
        return out

    def counts_of(r):
        c = r["counts"]
        if isinstance(c, (bytes, str)):
            c = string_to_counts(c.encode("ascii") if isinstance(c, str) else c)
        return (ctypes.c_long * len(c))(*[int(x) for x in c]), len(c)

    dts = [counts_of(r) for r in dt_rles]
    gts = [counts_of(r) for r in gt_rles]
    for i, (dc, dn) in enumerate(dts):
        for j, (gc, gn) in enumerate(gts):
            out[i, j] = lib.rle_iou_single(dc, dn, gc, gn, int(bool(iscrowd[j])))
    return out
