"""Mean-field CRF refinement of softmax maps, in-graph.

Parity target: the reference's experimental `dense_crf`
(src/postprocessing.py:183-225) — pydensecrf's DenseCRF2D with a Gaussian
pairwise term (smoothness) and a bilateral term (appearance), Potts
compatibility, N mean-field iterations. The reference notes it was too slow
to use (README); it stays off the default path here too.

TPU-native formulation: the fully-connected permutohedral filtering is
replaced by (a) an exact separable Gaussian for the smoothness kernel and
(b) an exact *windowed* bilateral for the appearance kernel (all pairs within
a (2r+1)^2 window, weights exp(-|dp|^2/2sxy^2 - |dI|^2/2srgb^2)). With the
reference's defaults (sxy=1, srgb=50) the true kernels have negligible mass
outside a few pixels, so the windowed form is numerically equivalent while
staying a dense stencil XLA can fuse (no data-dependent lattice).

Mean-field update with Potts compatibility mu(l,l') = [l != l']:
    Q <- softmax(log U + sum_m compat_m * (k_m (*) Q))
(the constant per-pixel total message is absorbed by the softmax).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma, radius):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / jnp.sum(k)


def _gaussian_blur(x, sigma, radius):
    """Separable Gaussian over (H, W, C)."""
    k = _gaussian_kernel1d(sigma, radius)
    pad = [(radius, radius), (0, 0), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    x = jnp.einsum("k,khwc->hwc",
                   k, jnp.stack([xp[i:i + x.shape[0]] for i in
                                 range(2 * radius + 1)]))
    pad = [(0, 0), (radius, radius), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    x = jnp.einsum("k,khwc->hwc",
                   k, jnp.stack([xp[:, i:i + x.shape[1]] for i in
                                 range(2 * radius + 1)]))
    return x


def _shift(x, dy, dx):
    """Shift (H, W, C) by (dy, dx), zero-filled."""
    h, w = x.shape[:2]
    out = jnp.zeros_like(x)
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[yd, xd].set(x[ys, xs])


def _bilateral_message(q, image, sxy, srgb, radius):
    """Windowed bilateral filtering of Q guided by the RGB image.

    image: (H, W, 3) in 0..255 scale (pydensecrf convention for srgb).
    """
    msg = jnp.zeros_like(q)
    norm = jnp.zeros(q.shape[:2] + (1,), q.dtype)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            spatial = jnp.exp(-(dy * dy + dx * dx) / (2.0 * sxy * sxy))
            shifted_img = _shift(image, dy, dx)
            color = jnp.exp(
                -jnp.sum((image - shifted_img) ** 2, -1, keepdims=True)
                / (2.0 * srgb * srgb))
            wgt = spatial * color
            msg = msg + wgt * _shift(q, dy, dx)
            norm = norm + wgt
    return msg / jnp.maximum(norm, 1e-8)


@partial(jax.jit, static_argnames=("iterations", "radius_gaussian",
                                   "radius_bilateral"))
def dense_crf(
    image,
    probs,
    iterations: int = 5,
    compat_gaussian: float = 3.0,
    sxy_gaussian: float = 1.0,
    compat_bilateral: float = 10.0,
    sxy_bilateral: float = 1.0,
    srgb: float = 50.0,
    radius_gaussian: int = 3,
    radius_bilateral: int = 3,
):
    """Refine class probabilities with mean-field CRF.

    Args:
        image: (H, W, 3) RGB in [0, 1] (denormalized, like the reference's
            denormalize_img step at src/postprocessing.py:215-217).
        probs: (H, W, C) softmax probabilities.

    Returns:
        (H, W, C) refined probabilities.
    """
    image255 = image.astype(jnp.float32) * 255.0
    log_unary = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-8))
    q = probs.astype(jnp.float32)
    for _ in range(iterations):
        m_gauss = _gaussian_blur(q, sxy_gaussian, radius_gaussian) - q
        m_bilat = _bilateral_message(q, image255, sxy_bilateral, srgb,
                                     radius_bilateral)
        logits = (log_unary + compat_gaussian * m_gauss
                  + compat_bilateral * m_bilat)
        q = jax.nn.softmax(logits, axis=-1)
    return q


def dense_crf_batch(images, probs, **kwargs):
    """vmapped batch variant: images (B, H, W, 3), probs (B, H, W, C)."""
    return jax.vmap(lambda im, p: dense_crf(im, p, **kwargs))(images, probs)
