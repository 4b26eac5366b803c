"""On-device augmentation & preprocessing (stateless, explicit RNG keys).

TPU-native replacement for the reference's host-side imgaug/PIL transforms
(src/augmentation.py, src/loaders.py:225-304): everything here is jax-jittable
and runs batched on device right after the raw uint8 batch lands in HBM, so
host workers only decode files.

Reproduced policies:
 - fast_seq (src/augmentation.py:5-10): 1-2 of {fliplr(0.5), flipud(0.5),
   affine rotate +-10deg translate +-10%}, applied jointly to image+targets.
   (imgaug randomizes op order; flips commute, and affine/flip order only
   permutes the same symmetry group, so a fixed order is distribution-
   equivalent up to that permutation.)
 - color_seq (src/augmentation.py:12-31): one of {H,S,V,R,G,B} += U(0,100).
 - crop_seq / padding_seq (src/augmentation.py:34-43): fast_seq + random
   crop to (h, w) for training; replicate pad for padded inference.
 - resize+ImageNet-normalize image transform and mask/distance/size target
   transform with the loader's sqrt(sizes) (src/loaders.py:147-169,250-260).

Targets ride a single (B, H, W, 3) float32 stack [mask, dist, sqrt(size)];
warps sample the mask/size channels with nearest and image/distances
bilinearly.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from mapping_tpu.constants import MEAN, STD

_MEAN = jnp.asarray(MEAN, jnp.float32)
_STD = jnp.asarray(STD, jnp.float32)


def normalize_image(image):
    """uint8/float (B, H, W, 3) -> ImageNet-normalized float32 (0..1 scale)."""
    x = image.astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(image).dtype, jnp.integer):
        x = x / 255.0
    return (x - _MEAN) / _STD


def resize_bilinear(x, size: Tuple[int, int]):
    b = x.shape[0]
    return jax.image.resize(x, (b, size[0], size[1]) + x.shape[3:], "linear")


def resize_nearest(x, size: Tuple[int, int]):
    b = x.shape[0]
    return jax.image.resize(x, (b, size[0], size[1]) + x.shape[3:], "nearest")


# ---------------------------------------------------------------------------
# geometric warps
# ---------------------------------------------------------------------------

def _affine_grid(h, w, angle_deg, tx_frac, ty_frac):
    """Sampling coordinates for rotation about the image center + translate.

    Matches imgaug Affine semantics (rotate degrees CCW, translate as a
    fraction of the axis size, constant fill 0).
    """
    theta = -angle_deg * jnp.pi / 180.0  # sample-grid rotation is inverse
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * yy - sin * xx + cy - ty_frac * h
    src_x = sin * yy + cos * xx + cx - tx_frac * w
    return src_y, src_x


def _sample(img, src_y, src_x, order):
    """img (H, W, C); bilinear (order=1) or nearest (order=0), cval 0."""
    h, w = img.shape[:2]

    def gather(yi, xi):
        yi_c = jnp.clip(yi, 0, h - 1)
        xi_c = jnp.clip(xi, 0, w - 1)
        vals = img[yi_c, xi_c]
        inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(img.dtype)
        return vals * inside[..., None]

    if order == 0:
        yi = jnp.round(src_y).astype(jnp.int32)
        xi = jnp.round(src_x).astype(jnp.int32)
        return gather(yi, xi)
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    fy = (src_y - y0)[..., None]
    fx = (src_x - x0)[..., None]
    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _fast_augment_one(rng, image, target):
    """image (H, W, 3) f32, target (H, W, 3) [mask, dist, sqrt_size] f32."""
    h, w = image.shape[:2]
    k_n, k_pick, k_lr, k_ud, k_rot, k_tx, k_ty = jax.random.split(rng, 7)

    # SomeOf((1,2), [fliplr(0.5), flipud(0.5), affine]): pick how many ops
    # and which; each flip then fires with prob 0.5 on its own.
    n_ops = jax.random.randint(k_n, (), 1, 3)  # 1 or 2
    perm = jax.random.permutation(k_pick, 3)
    selected = jnp.zeros((3,), bool).at[perm[0]].set(True)
    selected = jnp.where(n_ops == 2, selected.at[perm[1]].set(True), selected)

    do_lr = selected[0] & (jax.random.uniform(k_lr) < 0.5)
    do_ud = selected[1] & (jax.random.uniform(k_ud) < 0.5)
    do_affine = selected[2]

    image = jnp.where(do_lr, image[:, ::-1], image)
    target = jnp.where(do_lr, target[:, ::-1], target)
    image = jnp.where(do_ud, image[::-1], image)
    target = jnp.where(do_ud, target[::-1], target)

    angle = jax.random.uniform(k_rot, (), minval=-10.0, maxval=10.0)
    tx = jax.random.uniform(k_tx, (), minval=-0.1, maxval=0.1)
    ty = jax.random.uniform(k_ty, (), minval=-0.1, maxval=0.1)
    angle = jnp.where(do_affine, angle, 0.0)
    tx = jnp.where(do_affine, tx, 0.0)
    ty = jnp.where(do_affine, ty, 0.0)
    src_y, src_x = _affine_grid(h, w, angle, tx, ty)
    image = _sample(image, src_y, src_x, order=1)
    # mask & sqrt-size sample nearest; distances bilinear
    t_nearest = _sample(target[..., (0, 2)], src_y, src_x, order=0)
    t_linear = _sample(target[..., 1:2], src_y, src_x, order=1)
    target = jnp.concatenate(
        [t_nearest[..., :1], t_linear, t_nearest[..., 1:]], axis=-1)
    return image, target


def fast_augment(rng, images, targets):
    """Batched fast_seq: images (B, H, W, 3) f32, targets (B, H, W, 3)."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(_fast_augment_one)(keys, images, targets)


def random_crop(rng, images, targets, size: Tuple[int, int]):
    """Joint random crop to (h, w) (reference RandomCropFixedSize)."""
    b, h, w = images.shape[:3]
    ch, cw = size
    keys = jax.random.split(rng, b)

    def one(key, img, tgt):
        ky, kx = jax.random.split(key)
        top = jax.random.randint(ky, (), 0, h - ch + 1)
        left = jax.random.randint(kx, (), 0, w - cw + 1)
        img_c = jax.lax.dynamic_slice(img, (top, left, 0), (ch, cw, img.shape[-1]))
        tgt_c = jax.lax.dynamic_slice(tgt, (top, left, 0), (ch, cw, tgt.shape[-1]))
        return img_c, tgt_c

    return jax.vmap(one)(keys, images, targets)


def pad_replicate(x, pad: Tuple[int, int]):
    """Edge-replicate pad of (B, H, W, C) by (h_pad, w_pad) per side
    (reference PadFixed with cv2.BORDER_REPLICATE)."""
    hp, wp = pad
    return jnp.pad(x, ((0, 0), (hp, hp), (wp, wp), (0, 0)), mode="edge")


def pad_reflect(x, pad: Tuple[int, int]):
    """Reflect pad of (B, H, W, C) by (h_pad, w_pad) per side WITHOUT
    repeating the border pixel — cv2.BORDER_REFLECT_101 semantics, the
    reference PadFixed's 'reflect' mode (src/augmentation.py:46-54).
    jnp.pad's 'reflect' is exactly this convention (gfedcb|abcdefgh|gfedcb)."""
    hp, wp = pad
    return jnp.pad(x, ((0, 0), (hp, hp), (wp, wp), (0, 0)), mode="reflect")


#: the reference's PadFixed.PAD_FUNCTION dispatch (src/augmentation.py:46-49)
PAD_FUNCTION = {"replicate": pad_replicate, "reflect": pad_reflect}


def pad_fixed(x, pad: Tuple[int, int], method: str = "replicate"):
    """PadFixed equivalent: pad by the configured method name."""
    try:
        return PAD_FUNCTION[method](x, pad)
    except KeyError:
        raise ValueError(
            f"unknown pad_method {method!r}; expected one of "
            f"{sorted(PAD_FUNCTION)}") from None


def center_crop(x, size: Tuple[int, int]):
    """(B, H, W, C) -> centered (B, h, w, C) (undo of padded inference,
    reference crop_image_center_per_class src/postprocessing.py:239-258)."""
    h, w = x.shape[1:3]
    ch, cw = size
    top = (h - ch) // 2
    left = (w - cw) // 2
    return x[:, top:top + ch, left:left + cw]


# ---------------------------------------------------------------------------
# color shifts (TTA color_seq)
# ---------------------------------------------------------------------------

def color_shift(rng, image_u8):
    """One random channel of HSV or RGB += U(0, 100), uint8 semantics.

    (Reference color_seq, src/augmentation.py:12-31.)
    image_u8: (H, W, 3) float in 0..255 range.
    """
    k_choice, k_add = jax.random.split(rng)
    choice = jax.random.randint(k_choice, (), 0, 6)  # 0-2 HSV ch, 3-5 RGB ch
    add = jax.random.uniform(k_add, (), minval=0.0, maxval=100.0)

    def rgb_branch(img):
        ch = choice - 3
        shifted = jnp.clip(img[..., ch] + add, 0, 255)
        return img.at[..., ch].set(shifted)

    def hsv_branch(img):
        hsv = _rgb_to_hsv_arr(img / 255.0)
        # imgaug adds in uint8 scale: H in 0..180? it converts via cv2 where
        # H is 0..179, S/V 0..255. Match that scale.
        scale = jnp.where(choice == 0, 180.0, 255.0)
        ch_val = hsv[..., choice] * scale + add
        ch_val = jnp.where(choice == 0, jnp.mod(ch_val, 180.0),
                           jnp.clip(ch_val, 0, 255))
        hsv = hsv.at[..., choice].set(ch_val / scale)
        return jnp.clip(_hsv_to_rgb_arr(hsv) * 255.0, 0, 255)

    return jax.lax.cond(choice >= 3, rgb_branch, hsv_branch, image_u8)


def _rgb_to_hsv_arr(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.mod(h / 6.0, 1.0)
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb_arr(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = jnp.mod(i, 6.0).astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, q, p, p, q])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, q, v])
    return jnp.stack([r, g, b], axis=-1)
