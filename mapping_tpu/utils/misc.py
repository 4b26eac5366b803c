"""Small host utilities mirroring the reference's src/utils.py leftovers."""

import math

import numpy as np

from mapping_tpu.constants import MEAN, STD


def softmax(x, axis=-1):
    """Numerically-stable numpy softmax (reference src/utils.py softmax —
    on-device paths use jax.nn.softmax; this is the host-side twin)."""
    x = np.asarray(x, dtype=np.float64)
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def denormalize_img(image, mean=MEAN, std=STD):
    """Undo ImageNet normalization; accepts (..., H, W, 3) NHWC or
    (3, H, W) CHW like the reference (src/utils.py:324-325)."""
    image = np.asarray(image)
    if image.shape[-1] == 3:
        return image * np.asarray(std) + np.asarray(mean)
    return (image * np.asarray(std).reshape(3, 1, 1)
            + np.asarray(mean).reshape(3, 1, 1))


def generate_data_frame_chunks(meta, chunk_size):
    """Yield row chunks of a DataFrame (reference src/utils.py:300-305)."""
    n_rows = meta.shape[0]
    for i in range(math.ceil(n_rows / chunk_size)):
        yield meta.iloc[i * chunk_size:(i + 1) * chunk_size]


class Averager:
    """Running mean (reference src/steps/pytorch/utils.py:78-101)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def send(self, value):
        self.sum += float(value)
        self.count += 1

    @property
    def value(self):
        return self.sum / self.count if self.count else 0.0
