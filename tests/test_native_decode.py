"""Native libjpeg/libpng decode (cpp/decode.cpp) must match PIL byte-for-byte
on the formats it claims (RGB JPEG, gray/RGB PNG) and decline the rest."""

import numpy as np
import pytest

from mapping_tpu.utils import native_decode


@pytest.fixture(scope="module", autouse=True)
def _built():
    if not native_decode.build():
        pytest.skip("native decode toolchain unavailable")


def _pil_rgb(path):
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def test_png_gray_exact(tmp_path):
    from imageio import imwrite

    rng = np.random.RandomState(0)
    mask = rng.randint(0, 3, (40, 50)).astype(np.uint8)
    p = str(tmp_path / "mask.png")
    imwrite(p, mask)
    got = native_decode.decode_gray(p)
    assert got is not None
    np.testing.assert_array_equal(got, mask)


def test_png_rgb_exact(tmp_path):
    from imageio import imwrite

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (30, 20, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    imwrite(p, img)
    got = native_decode.decode_rgb(p)
    assert got is not None
    np.testing.assert_array_equal(got, img)


def test_jpeg_rgb_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 48, 3)).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=90)
    got = native_decode.decode_rgb(p)
    assert got is not None
    want = _pil_rgb(p)
    # both decode through libjpeg with the default ISLOW IDCT: identical
    np.testing.assert_array_equal(got, want)


def test_rgba_png_declined(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 4)).astype(np.uint8)
    p = str(tmp_path / "rgba.png")
    Image.fromarray(img, "RGBA").save(p)
    # alpha compositing rounds differently across codecs -> PIL handles it
    assert native_decode.decode_rgb(p) is None


def test_loader_uses_native_path(tmp_path):
    from imageio import imwrite

    from mapping_tpu.data.loader import load_image

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    imwrite(p, img)
    np.testing.assert_array_equal(load_image(p), img)


def test_missing_file_declined():
    assert native_decode.decode_rgb("/nonexistent/x.jpg") is None


def test_bytes_jpeg_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=85)
    with open(p, "rb") as f:
        body = f.read()
    got = native_decode.decode_rgb_bytes(body)
    assert got is not None
    np.testing.assert_array_equal(got, _pil_rgb(p))


def test_bytes_png_exact(tmp_path):
    from imageio import imwrite

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (20, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    imwrite(p, img)
    with open(p, "rb") as f:
        body = f.read()
    got = native_decode.decode_rgb_bytes(body)
    assert got is not None
    np.testing.assert_array_equal(got, img)


def test_bytes_garbage_and_rgba_declined(tmp_path):
    from PIL import Image

    assert native_decode.decode_rgb_bytes(b"not an image at all") is None
    assert native_decode.decode_rgb_bytes(b"") is None
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (8, 8, 4)).astype(np.uint8)
    p = str(tmp_path / "rgba.png")
    Image.fromarray(img, "RGBA").save(p)
    with open(p, "rb") as f:
        body = f.read()
    assert native_decode.decode_rgb_bytes(body) is None  # PIL's job


def test_bytes_fuzz_corrupt_buffers_never_crash(tmp_path):
    """Truncated/bit-flipped JPEG+PNG bytes must never crash: either None
    (the C error paths longjmp out of libjpeg / fail png_image reads) or a
    well-formed uint8 HWC array of BOUNDED size — a corrupt header claiming
    a 12 GB image must be declined, not allocated (the daemon decodes
    untrusted request bodies)."""
    from PIL import Image

    def ok(out):
        return out is None or (
            out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
            and out.shape[0] * out.shape[1] <= native_decode._MAX_PIXELS)

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
    bodies = []
    for fmt in ("JPEG", "PNG"):
        import io

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format=fmt)
        bodies.append(bytearray(buf.getvalue()))
    for body in bodies:
        for cut in (9, len(body) // 4, len(body) // 2, len(body) - 3):
            assert ok(native_decode.decode_rgb_bytes(bytes(body[:cut])))
        for _ in range(50):
            corrupt = bytearray(body)
            for pos in rng.randint(2, len(corrupt), size=8):
                corrupt[pos] = rng.randint(0, 256)
            assert ok(native_decode.decode_rgb_bytes(bytes(corrupt)))


def test_daemon_request_decode_uses_native_bytes_path(tmp_path):
    """decode_request_image must produce the same array whichever decoder
    serves it (native in-memory vs PIL fallback)."""
    from PIL import Image

    from mapping_tpu.infer.daemon import decode_request_image

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=90)
    with open(p, "rb") as f:
        body = f.read()
    got = decode_request_image(body, "image/jpeg", (32, 32))
    np.testing.assert_array_equal(got, _pil_rgb(p))
