"""Real pixel decode/resample for container-less formats (PPM/PGM/BMP).

The reference has no media pipeline; this is part of the training-data
operator family. Decoders are pure numpy; formats that genuinely need
external codecs (JPEG/PNG) raise NotImplementedError and keep the
declared stand-in path.
"""

import struct

import numpy as np
import pytest

from ferret_spark.pipeline import (
    decode_image,
    encode_ppm,
    resize_pixels,
)


def _ppm_p6(arr):
    return encode_ppm(arr)


def _bmp_24(arr, top_down=False):
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[:, :, ::-1].reshape(h, w * 3)  # BGR
    if not top_down:
        rows = rows[::-1]
    pix = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(pix), 2835, 2835, 0, 0,
    )
    return header + dib + pix


@pytest.fixture
def img4x4():
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)


def test_ppm_p6_roundtrip(img4x4):
    assert np.array_equal(decode_image(_ppm_p6(img4x4)), img4x4)


def test_ppm_p3_ascii(img4x4):
    body = " ".join(str(v) for v in img4x4.flatten())
    payload = f"P3\n# comment\n4 4\n255\n{body}\n".encode()
    assert np.array_equal(decode_image(payload), img4x4)


def test_pgm_p5_broadcasts_gray():
    gray = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = b"P5\n4 4\n255\n" + gray.tobytes()
    out = decode_image(payload)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_bmp_bottom_up_and_top_down(img4x4):
    assert np.array_equal(decode_image(_bmp_24(img4x4)), img4x4)
    assert np.array_equal(
        decode_image(_bmp_24(img4x4, top_down=True)), img4x4
    )


def test_bmp_row_padding():
    # width 3 -> 9-byte rows padded to 12: padding must be skipped
    arr = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(decode_image(_bmp_24(arr)), arr)


def test_codec_bound_format_raises_without_pil():
    from ferret_spark.pipeline import _pil_image_module

    if _pil_image_module() is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0JPEG-ish opaque payload")


def test_resize_box_average_exact():
    # 4x4 -> 2x2: each output pixel is the exact mean of a 2x2 box
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[0, 0] = [10, 20, 30]
    arr[0, 1] = [30, 40, 50]
    arr[1, 0] = [50, 60, 70]
    arr[1, 1] = [70, 80, 90]
    out = resize_pixels(arr, 2, 2)
    assert out.shape == (2, 2, 3)
    assert list(out[0, 0]) == [40, 50, 60]
    assert list(out[1, 1]) == [0, 0, 0]


def test_resize_nearest_non_integer_factor():
    arr = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    out = resize_pixels(arr, 2, 2)
    # pixel-center mapping: ys = floor((i+0.5)*5/2) = [1, 3]
    #                       xs = floor((i+0.5)*3/2) = [0, 2]
    assert np.array_equal(out[0, 0], arr[1, 0])
    assert np.array_equal(out[1, 1], arr[3, 2])


def test_media_resize_real_pixels_through_spark(spark):
    """End-to-end: a synthesized PPM rides the binary column through
    mapInPandas and comes back with exact box-averaged pixels."""
    from ferret_spark.pipeline import media_resize

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(_ppm_p6(arr)), "image/x-portable-pixmap", 8, 8),
        (1, bytearray(b"\xff\xd8\xffJPEG-ish opaque payload"), "image/jpeg", 8, 8),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media binary, media_type string, width int, height int"
    )
    out = {
        r["doc_id"]: r
        for r in media_resize(media, out_w=4, out_h=4).collect()
    }
    decoded = decode_image(bytes(out[0]["media"]))
    assert np.array_equal(decoded, resize_pixels(arr, 4, 4))
    assert out[0]["width"] == 4 and out[0]["height"] == 4
    # the codec-bound payload keeps the declared stand-in path
    assert out[1]["media_type"] == "image/jpeg"
    assert len(bytes(out[1]["media"])) > 0


def test_pil_feature_flag():
    """With Pillow importable, JPEG decodes for real; without it, the
    NotImplementedError stand-in stays declared. (PNG no longer depends
    on Pillow at all — the vendored decoder covers it; see test_png.py.)
    This test follows whichever environment it runs in."""
    import io

    import pytest

    from ferret_spark.pipeline import _pil_image_module, decode_image

    pil = _pil_image_module()
    if pil is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    else:
        arr = (np.arange(48) % 251).reshape(4, 4, 3).astype(np.uint8)
        buf = io.BytesIO()
        pil.fromarray(arr).save(buf, format="JPEG")
        out = decode_image(buf.getvalue())
        assert out.shape == (4, 4, 3)
