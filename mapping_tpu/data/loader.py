"""Batch loaders: host decode -> one jitted on-device preprocess per mode.

Replaces the reference's DataLoader(num_workers=4) fork-per-worker pipeline
(src/loaders.py:176-304) where PIL/imgaug ran per item on host. Here host
threads only read+decode files into uint8/float32 numpy; augmentation,
resize, crop/pad and ImageNet normalization are one jitted program applied to
the whole batch on device (mapping_tpu.data.augment).

Loader modes mirror the reference registry:
 - 'resize'       -> MetadataImageSegmentationLoader[Distances]Resize
                     (src/loaders.py:246-260,291-304)
 - 'crop_and_pad' -> ...CropPad (train random crop, inference replicate pad,
                     src/loaders.py:225-243,266-284)
Target convention: (B, H, W, 3) float32 [mask, distance, sqrt(size)] — the
loader sqrt's the size matrix exactly like the reference dataset
(src/loaders.py:152-153).
"""

import os
import queue
import threading
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mapping_tpu.data import augment as A


# ---------------------------------------------------------------------------
# host decode
# ---------------------------------------------------------------------------

def load_image(path) -> np.ndarray:
    # native libjpeg/libpng fast path (cpp/decode.cpp): no Python objects in
    # the decode, GIL released for the whole call — the decode threads then
    # actually scale with host cores. Exact-output cases only; PIL otherwise.
    from mapping_tpu.utils import native_decode

    img = native_decode.decode_rgb(path)
    if img is not None:
        return img
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def load_target(mask_path) -> np.ndarray:
    """mask png + joblib distance/size artifacts -> (H, W, 3) uint16.

    Path rewrite /masks/ -> /distances/ -> /sizes/ follows the reference
    dataset contract (src/loaders.py:140-150). Every channel's values are
    exactly uint16-representable (mask: decoded bytes; distance: the
    reference truncates to uint16 at load, src/loaders.py:151-152; size:
    uint16 -> sqrt -> uint16 floor <= 255, src/loaders.py:152-153), so the
    batch ships host->device at 2 bytes/px and the jitted batch transform
    casts to float32 on device — bit-identical supervision at half the H2D
    bytes (and half the per-transfer host-memory retention of the attached
    chip's tunnel client — see ROUND5.md).
    """
    import joblib

    from mapping_tpu.utils import native_decode

    mask_u8 = native_decode.decode_gray(mask_path)
    if mask_u8 is not None:
        mask = mask_u8.astype(np.uint16)
    else:
        from PIL import Image

        with Image.open(mask_path) as m:
            mask = np.asarray(m.convert("L"), dtype=np.uint16)
    distance_path = os.path.splitext(mask_path.replace("/masks/", "/distances/"))[0]
    size_path = distance_path.replace("/distances/", "/sizes/")
    if os.path.exists(distance_path):
        dist = np.asarray(joblib.load(distance_path)).astype(np.uint16)
    else:
        dist = np.zeros_like(mask)
    if os.path.exists(size_path):
        sizes = np.asarray(joblib.load(size_path)).astype(np.uint16)
        sizes = np.sqrt(sizes).astype(np.uint16)
    else:
        sizes = np.ones_like(mask)
    return np.stack([mask, dist, sizes], axis=-1)


# ---------------------------------------------------------------------------
# device-side batch transforms (one jit per mode)
# ---------------------------------------------------------------------------

def _resize_target(target, size):
    near = A.resize_nearest(target[..., (0, 2)], size)
    lin = A.resize_bilinear(target[..., 1:2], size)
    return jnp.concatenate([near[..., :1], lin, near[..., 1:]], axis=-1)


@partial(jax.jit, static_argnames=("size", "augment"))
def _train_batch_resize(rng, image_u8, target, size, augment=True):
    img = image_u8.astype(jnp.float32) / 255.0
    target = target.astype(jnp.float32)
    if augment:
        img, target = A.fast_augment(rng, img, target)
    img = A.resize_bilinear(img, size)
    target = _resize_target(target, size)
    return {"image": (img - A._MEAN) / A._STD, "target": target}


@partial(jax.jit, static_argnames=("size",))
def _eval_batch_resize(image_u8, target, size):
    img = A.resize_bilinear(image_u8.astype(jnp.float32) / 255.0, size)
    out = {"image": (img - A._MEAN) / A._STD}
    if target is not None:
        out["target"] = _resize_target(target.astype(jnp.float32), size)
    return out


@partial(jax.jit, static_argnames=("size",))
def _infer_batch_resize(image_u8, size):
    img = A.resize_bilinear(image_u8.astype(jnp.float32) / 255.0, size)
    return {"image": (img - A._MEAN) / A._STD}


@partial(jax.jit, static_argnames=("size", "augment"))
def _train_batch_crop(rng, image_u8, target, size, augment=True):
    img = image_u8.astype(jnp.float32) / 255.0
    target = target.astype(jnp.float32)
    if augment:
        k1, k2 = jax.random.split(rng)
        img, target = A.fast_augment(k1, img, target)
        img, target = A.random_crop(k2, img, target, size)
    else:
        img = A.center_crop(img, size)
        target = A.center_crop(target, size)
    return {"image": (img - A._MEAN) / A._STD, "target": target}


@partial(jax.jit, static_argnames=("pad", "method"))
def _infer_batch_pad(image_u8, pad, method="replicate"):
    img = A.pad_fixed(image_u8.astype(jnp.float32) / 255.0, pad, method)
    return {"image": (img - A._MEAN) / A._STD}


# ---------------------------------------------------------------------------
# batch iteration with background decode
# ---------------------------------------------------------------------------

class _Prefetcher:
    """Decode next host batch on a worker thread while device crunches."""

    def __init__(self, make_batch, n_batches, depth=2):
        self.q = queue.Queue(maxsize=depth)
        self.n = n_batches
        self._cancelled = False

        def run():
            try:
                for i in range(n_batches):
                    if self._cancelled:
                        return
                    self.q.put(("ok", make_batch(i)))
            except Exception as e:  # surface decode errors to the consumer
                self.q.put(("err", e))

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()

    def __iter__(self):
        for _ in range(self.n):
            kind, item = self.q.get()
            if kind == "err":
                raise item
            yield item

    def cancel(self):
        """Unblock and retire the worker; drop the decoded batches. Used
        when a speculative next-epoch prefetch turns out to be the last."""
        self._cancelled = True
        while self.thread.is_alive():
            try:
                self.q.get_nowait()
            except queue.Empty:
                self.thread.join(timeout=0.05)


class SegmentationLoader:
    """Produces {'datagen': (iterable, steps), 'validation_datagen': ...}
    like the reference loader transformers (src/loaders.py:192-204), but each
    yielded batch is already on device, augmented and normalized."""

    def __init__(
        self,
        mode: str = "resize",
        size: Tuple[int, int] = (256, 256),
        pad: Tuple[int, int] = (10, 10),
        pad_method: str = "replicate",
        batch_size_train: int = 20,
        batch_size_inference: int = 20,
        seed: int = 1234,
        augment: bool = True,
        load_in_memory: bool = False,
    ):
        if mode not in ("resize", "crop_and_pad"):
            raise ValueError(f"unknown loader mode {mode!r}")
        if pad_method not in A.PAD_FUNCTION:
            raise ValueError(f"unknown pad_method {pad_method!r}; expected "
                             f"one of {sorted(A.PAD_FUNCTION)}")
        self.mode = mode
        self.size = tuple(size)
        self.pad = tuple(pad)
        # 'replicate' | 'reflect' — the reference PadFixed.PAD_FUNCTION knob
        # (src/augmentation.py:46-49, neptune.yaml:79)
        self.pad_method = pad_method
        self.batch_size_train = batch_size_train
        self.batch_size_inference = batch_size_inference
        self.augment = augment
        # decoded-file cache (reference load_in_memory, neptune.yaml:14) —
        # the host here is 1-core, so re-decoding every epoch would dominate
        self.load_in_memory = load_in_memory
        self._cache = {} if load_in_memory else None
        self._rng = jax.random.PRNGKey(seed)
        self._np_rng = np.random.RandomState(seed)

    def _cached(self, loader, path):
        if self._cache is None:
            return loader(path)
        hit = self._cache.get(path)
        if hit is None:
            hit = self._cache[path] = loader(path)
        return hit

    # -- host batch assembly -------------------------------------------------
    def _decode_many(self, loader, paths):
        """Decode files in parallel threads (PIL/joblib release the GIL in
        their C cores; the reference used num_workers=4 DataLoader processes,
        src/pipeline_config.py:50-57)."""
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        paths = list(paths)
        if len(paths) <= 1 or (_os.cpu_count() or 1) <= 1:
            return [self._cached(loader, p) for p in paths]
        with ThreadPoolExecutor(max_workers=min(8, _os.cpu_count())) as ex:
            return list(ex.map(lambda p: self._cached(loader, p), paths))

    def _assemble(self, image_paths, target_paths, idxs):
        images = self._decode_many(load_image, np.asarray(image_paths)[idxs])
        hetero = len({im.shape for im in images}) > 1
        if hetero:
            # heterogeneous sizes: host-resize to the device target size
            from PIL import Image

            size = self.size[::-1]
            images = [
                np.asarray(Image.fromarray(im).resize(size, Image.BILINEAR))
                for im in images
            ]
        image_b = np.stack(images)
        if target_paths is None:
            return image_b, None
        targets = self._decode_many(load_target, np.asarray(target_paths)[idxs])
        if hetero:
            # targets must follow their images: stacking unresized targets
            # either crashes np.stack or silently misaligns supervision.
            # Same channel semantics as the device-side _resize_target:
            # NEAREST for the categorical mask/sizes channels, BILINEAR for
            # the continuous distance channel.
            from PIL import Image

            size = self.size[::-1]
            modes = (Image.NEAREST, Image.BILINEAR, Image.NEAREST)
            targets = [
                np.dstack([
                    np.asarray(Image.fromarray(
                        t[..., c].astype(np.float32)).resize(
                        size, modes[min(c, 2)]))
                    for c in range(t.shape[-1])
                ]) for t in targets
            ]
        # homogeneous (the normal case): stays uint16 for the H2D copy; the
        # jitted device transform casts to float32 (values identical)
        return image_b, np.stack(targets)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- datagen construction ------------------------------------------------
    # Datagens are re-iterable (one pass per epoch, reshuffled), matching the
    # reference's repeated DataLoader iteration in Model.fit
    # (src/steps/pytorch/models.py:57-66).
    def _train_gen(self, X, y):
        n = len(X)
        bs = self.batch_size_train
        steps = -(-n // bs)
        loader = self
        #: (epoch_prefetcher) started at the END of the previous epoch so the
        # next epoch's first batches decode while epoch-end callbacks
        # (validation AP, checkpoint writes) run — without it every epoch
        # starts with a decode stall (reference relied on persistent
        # DataLoader workers for the same effect, neptune.yaml num_workers)
        state = {"next": None}

        def start_prefetch():
            order = loader._np_rng.permutation(n)

            def make_batch(i):
                return loader._assemble(X, y, order[i * bs:(i + 1) * bs])

            return _Prefetcher(make_batch, steps)

        class TrainFlow:
            def __iter__(self):
                prefetcher = state["next"] or start_prefetch()
                state["next"] = None
                for batch_id, (image_b, target_b) in enumerate(prefetcher):
                    if batch_id + 1 == steps:
                        # last host batch decoded: kick off the next epoch
                        state["next"] = start_prefetch()
                    rng = loader._next_rng()
                    if loader.mode == "resize":
                        yield _train_batch_resize(
                            rng, jnp.asarray(image_b), jnp.asarray(target_b),
                            loader.size, loader.augment)
                    else:
                        yield _train_batch_crop(
                            rng, jnp.asarray(image_b), jnp.asarray(target_b),
                            loader.size, loader.augment)

            def __len__(self):
                return steps

            def close(self):
                """Retire a speculative next-epoch prefetch (called by the
                trainer when the schedule ends / early-stops — otherwise its
                worker thread would sit blocked holding decoded batches)."""
                if state["next"] is not None:
                    state["next"].cancel()
                    state["next"] = None

        return TrainFlow(), steps

    def infer_preprocess(self, image_u8_batch):
        """The mode-dependent device preprocess inference batches get
        ((B, H, W, 3) uint8 -> normalized images): resize-to-size for
        'resize', replicate-pad for 'crop_and_pad'. Shared by _eval_gen and
        the online serving daemon so a served request sees EXACTLY the
        offline pipeline's input transform."""
        image_u8_batch = jnp.asarray(image_u8_batch)
        if self.mode == "resize":
            return _infer_batch_resize(image_u8_batch, self.size)["image"]
        return _infer_batch_pad(image_u8_batch, self.pad,
                                self.pad_method)["image"]

    def _eval_gen(self, X, y):
        n = len(X)
        bs = self.batch_size_inference
        steps = -(-n // bs)
        loader = self

        class EvalFlow:
            def __iter__(self):
                def make_batch(i):
                    idxs = np.arange(i * bs, min((i + 1) * bs, n))
                    if y is None and len(idxs) < bs:
                        # pure inference: pad the ragged tail by repeating
                        # the last image so the forward/postprocess program
                        # keeps ONE batch shape (a distinct tail shape costs
                        # minutes of compile on the attached chip). Every
                        # consumer zips per-image results against the meta
                        # table, which drops the duplicates. Validation
                        # batches (y given) stay ragged — padding would bias
                        # the mean loss.
                        idxs = np.concatenate(
                            [idxs, np.full(bs - len(idxs), idxs[-1])])
                    return loader._assemble(X, y, idxs)

                for image_b, target_b in _Prefetcher(make_batch, steps):
                    if target_b is None:
                        yield {"image": loader.infer_preprocess(image_b)}
                    elif loader.mode == "resize":
                        yield _eval_batch_resize(
                            jnp.asarray(image_b), jnp.asarray(target_b),
                            loader.size)
                    else:
                        out = _infer_batch_pad(jnp.asarray(image_b),
                                               loader.pad, loader.pad_method)
                        out = dict(out)
                        out["target"] = jnp.asarray(A.pad_fixed(
                            jnp.asarray(target_b).astype(jnp.float32),
                            loader.pad, loader.pad_method))
                        yield out

            def __len__(self):
                return steps

        flow = EvalFlow()
        flow.n_images = n  # real count; padded tail rows are duplicates
        return flow, steps

    def transform(self, X, y=None, X_valid=None, y_valid=None,
                  train_mode=True, **kwargs):
        if train_mode and y is not None:
            flow, steps = self._train_gen(X, y)
        else:
            flow, steps = self._eval_gen(X, y if not train_mode else None)
        if X_valid is not None and y_valid is not None:
            valid_flow, valid_steps = self._eval_gen(X_valid, y_valid)
        else:
            valid_flow, valid_steps = None, None
        return {"datagen": (flow, steps),
                "validation_datagen": (valid_flow, valid_steps)}
