"""COCO run-length encoding, wire-compatible with pycocotools.

The reference leans on pycocotools' C `_mask` module for RLE
encode/decode/IoU/bbox (src/utils.py:121-127, src/postprocessing.py:306-321,
src/cocoeval.py:170-197). That package is not a dependency here; this module
implements the same wire format (Fortran-order runs, LEB128-style compressed
`counts` strings) in vectorized numpy, with an optional C++ fast path
(mapping_tpu/utils/native.py) used when the extension is built.

All functions take/return the standard {"size": [h, w], "counts": bytes|str}
dicts so prediction JSON files are byte-compatible with pycocotools output.
"""

import numpy as np

try:  # optional C++ fast path
    from mapping_tpu.utils import native as _native
except Exception:  # pragma: no cover
    _native = None


# ---------------------------------------------------------------------------
# counts <-> compressed string (pycocotools rleToString / rleFrString format)
# ---------------------------------------------------------------------------

def counts_to_string(counts):
    """Compress integer run lengths to the COCO `counts` byte string."""
    if _native is not None and _native.available():
        return _native.counts_to_string(counts)
    s = bytearray()
    counts = [int(c) for c in counts]
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


def string_to_counts(s):
    """Decompress a COCO `counts` byte/str string to run lengths."""
    if isinstance(s, str):
        s = s.encode("ascii")
    if _native is not None and _native.available():
        return _native.string_to_counts(s)
    counts = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


# ---------------------------------------------------------------------------
# binary mask <-> RLE
# ---------------------------------------------------------------------------

def encode(mask):
    """Binary (H, W) uint8 mask -> compressed RLE dict.

    Matches pycocotools.mask.encode(np.asfortranarray(mask)); reference
    rle_from_binary (src/utils.py:121-123).
    """
    mask = np.asarray(mask)
    h, w = mask.shape
    flat = (mask != 0).flatten(order="F")
    counts = _runs_from_flat(flat)
    return {"size": [int(h), int(w)], "counts": counts_to_string(counts)}


def _runs_from_flat(flat):
    """Runs of a flat boolean array, starting with a (possibly 0-length) run
    of zeros."""
    n = flat.size
    if n == 0:
        return [0]
    change = np.nonzero(np.diff(flat))[0] + 1
    boundaries = np.concatenate([[0], change, [n]])
    runs = np.diff(boundaries).tolist()
    if flat[0]:
        runs = [0] + runs
    return runs


def decode(rle):
    """Compressed or uncompressed RLE dict -> (H, W) uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts)
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    flat = np.zeros(h * w, dtype=np.uint8)
    ends = np.cumsum(counts)
    starts = ends - counts
    for i in range(1, len(counts), 2):
        flat[starts[i]:ends[i]] = 1
    if total != h * w:  # defensive: malformed RLE
        flat = flat[: h * w]
    return flat.reshape((h, w), order="F")


def area(rle):
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts)
    return int(sum(counts[1::2]))


def to_bbox(rle):
    """RLE -> [x, y, w, h] float bbox, matching pycocotools.mask.toBbox."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts)
    counts = np.asarray(counts, dtype=np.int64)
    if counts[1::2].sum() == 0:
        return [0.0, 0.0, 0.0, 0.0]
    ends = np.cumsum(counts)
    starts = ends - counts
    fg_starts = starts[1::2]
    fg_ends = ends[1::2] - 1
    mask_nonzero = counts[1::2] > 0
    fg_starts = fg_starts[mask_nonzero]
    fg_ends = fg_ends[mask_nonzero]
    # Fortran order: linear index = x * h + y
    xs0, ys0 = fg_starts // h, fg_starts % h
    xs1, ys1 = fg_ends // h, fg_ends % h
    # a run can span multiple columns; then it covers full rows
    spans_col = xs1 > xs0
    if spans_col.any():
        y_min, y_max = 0, h - 1
    else:
        y_min, y_max = int(ys0.min()), int(ys1.max())
    x_min, x_max = int(xs0.min()), int(xs1.max())
    return [float(x_min), float(y_min), float(x_max - x_min + 1), float(y_max - y_min + 1)]


def merge(rles, intersect=False):
    """Union (or intersection) of several RLEs (pycocotools.mask.merge)."""
    if len(rles) == 0:
        raise ValueError("merge of zero RLEs")
    if len(rles) == 1:
        return dict(rles[0])
    out = decode(rles[0]).astype(bool)
    for r in rles[1:]:
        m = decode(r).astype(bool)
        out = out & m if intersect else out | m
    return encode(out.astype(np.uint8))


def iou(dt_rles, gt_rles, iscrowd):
    """Pairwise IoU matrix between detection and GT RLEs.

    Matches pycocotools.mask.iou: for iscrowd GT, the union term is just the
    detection area (crowd regions may overlap detections freely).

    Returns (len(dt), len(gt)) float64 array; empty inputs give [].
    """
    if _native is not None and _native.available():
        return _native.rle_iou(dt_rles, gt_rles, iscrowd)
    if len(dt_rles) == 0 or len(gt_rles) == 0:
        return np.zeros((len(dt_rles), len(gt_rles)))
    dt_masks = np.stack([decode(r).reshape(-1) for r in dt_rles]).astype(np.float32)
    gt_masks = np.stack([decode(r).reshape(-1) for r in gt_rles]).astype(np.float32)
    inter = dt_masks @ gt_masks.T
    dt_areas = dt_masks.sum(axis=1)[:, None]
    gt_areas = gt_masks.sum(axis=1)[None, :]
    iscrowd = np.asarray(iscrowd, dtype=bool)[None, :]
    union = np.where(iscrowd, dt_areas, dt_areas + gt_areas - inter)
    union = np.maximum(union, 1e-9)
    return inter / union


def iou_boxes(dt_boxes, gt_boxes, iscrowd):
    """Pairwise IoU between [x, y, w, h] boxes (pycocotools bbox mode)."""
    dt = np.asarray(dt_boxes, dtype=np.float64).reshape(-1, 4)
    gt = np.asarray(gt_boxes, dtype=np.float64).reshape(-1, 4)
    if dt.size == 0 or gt.size == 0:
        return np.zeros((dt.shape[0], gt.shape[0]))
    x1 = np.maximum(dt[:, None, 0], gt[None, :, 0])
    y1 = np.maximum(dt[:, None, 1], gt[None, :, 1])
    x2 = np.minimum(dt[:, None, 0] + dt[:, None, 2], gt[None, :, 0] + gt[None, :, 2])
    y2 = np.minimum(dt[:, None, 1] + dt[:, None, 3], gt[None, :, 1] + gt[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    dt_a = (dt[:, 2] * dt[:, 3])[:, None]
    gt_a = (gt[:, 2] * gt[:, 3])[None, :]
    iscrowd = np.asarray(iscrowd, dtype=bool)[None, :]
    union = np.where(iscrowd, dt_a, dt_a + gt_a - inter)
    union = np.maximum(union, 1e-9)
    return inter / union


# ---------------------------------------------------------------------------
# polygons / uncompressed objects -> RLE (pycocotools frPyObjects)
# ---------------------------------------------------------------------------

def from_polygons(polygons, h, w):
    """List of flat [x0, y0, x1, y1, ...] polygons -> list of RLE dicts.

    pycocotools rasterizes by tracing the boundary at 5x upsampling; we
    rasterize (PIL even-odd polygon fill) on a 5x grid then sample the cell
    centers, which reproduces its boundary handling to within a sub-pixel
    ring. AP at IoU=0.5 on 300x300 tiles is insensitive to this ring.
    """
    from PIL import Image, ImageDraw

    rles = []
    for poly in polygons:
        pts = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
        scaled = pts * 5.0 + 2.0
        img = Image.new("1", (w * 5, h * 5), 0)
        ImageDraw.Draw(img).polygon(
            [tuple(p) for p in scaled], outline=1, fill=1
        )
        canvas = np.asarray(img, dtype=np.uint8)
        mask = canvas.reshape(h, 5, w, 5)[:, 2, :, 2]
        rles.append(encode(mask))
    return rles


def from_py_objects(objs, h, w):
    """pycocotools.mask.frPyObjects equivalent for the shapes we need."""
    if isinstance(objs, dict):
        counts = objs["counts"]
        if isinstance(counts, list):
            return {"size": objs["size"], "counts": counts_to_string(counts)}
        return dict(objs)
    if isinstance(objs, (list, tuple)):
        if len(objs) == 0:
            return []
        if isinstance(objs[0], (int, float)):  # single flat polygon
            return from_polygons([objs], h, w)
        if isinstance(objs[0], dict):
            return [from_py_objects(o, h, w) for o in objs]
        return from_polygons(objs, h, w)
    raise TypeError(f"unsupported object for RLE conversion: {type(objs)}")


def annotation_to_rle(ann, h, w):
    """COCO annotation dict -> single merged RLE (like annToRLE)."""
    seg = ann["segmentation"]
    if isinstance(seg, dict):
        return from_py_objects(seg, h, w)
    rles = from_py_objects(seg, h, w)
    if isinstance(rles, dict):
        return rles
    return merge(rles)
