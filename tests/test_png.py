"""Vendored PNG decoder: round-trips against an independent FORWARD
filter encoder written here (apply the RFC 2083 filters as the spec
defines them, deflate, chunk) — the decoder inverts them, so agreement
exercises every filter path on real compressed-codec payloads without
Pillow in the environment."""

import struct
import zlib

import numpy as np
import pytest

from ferret_spark.png import PNG_SIGNATURE, decode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(f, line, prev, bpp):
    """RFC 2083 §6.3-6.6 forward filters (encoder side) on int arrays."""
    w = len(line)
    out = np.empty(w, np.int32)
    for x in range(w):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if f == 0:
            out[x] = line[x]
        elif f == 1:
            out[x] = (line[x] - a) & 0xFF
        elif f == 2:
            out[x] = (line[x] - b) & 0xFF
        elif f == 3:
            out[x] = (line[x] - ((a + b) >> 1)) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
    return out


def encode_png(px: np.ndarray, color_type: int, filters, palette=None,
               interlace: int = 0, split_idat: bool = False) -> bytes:
    """Minimal spec-following encoder: ``px`` is (H, W, C) uint8 samples
    in the color type's own sample layout; ``filters[y]`` picks the
    forward filter for row y."""
    h, w, ch = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    flat = px.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, np.int32)
    stream = bytearray()
    for y in range(h):
        f = filters[y]
        stream.append(f)
        stream += bytes(
            int(v) for v in _filter_row(f, flat[y], prev, ch)
        )
        prev = flat[y]
    comp = zlib.compress(bytes(stream))
    out = bytearray(PNG_SIGNATURE)
    out += _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if split_idat:
        mid = len(comp) // 2
        out += _chunk(b"IDAT", comp[:mid])
        out += _chunk(b"IDAT", comp[mid:])
    else:
        out += _chunk(b"IDAT", comp)
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _rand(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_rgb_single_filter_roundtrip(f):
    px = _rand(6, 5, 3, seed=f)
    got = decode_png(encode_png(px, 2, [f] * 6))
    assert np.array_equal(got, px)


def test_rgb_mixed_filters_and_split_idat():
    px = _rand(5, 7, 3, seed=21)
    payload = encode_png(px, 2, [0, 1, 2, 3, 4], split_idat=True)
    assert np.array_equal(decode_png(payload), px)


def test_rgba_drops_alpha():
    px = _rand(4, 4, 4, seed=3)
    got = decode_png(encode_png(px, 6, [4, 3, 2, 1]))
    assert np.array_equal(got, px[:, :, :3])


def test_grayscale_broadcasts():
    px = _rand(4, 6, 1, seed=7)
    got = decode_png(encode_png(px, 0, [1, 4, 2, 3]))
    assert got.shape == (4, 6, 3)
    assert np.array_equal(got[:, :, 0], px[:, :, 0])
    assert np.array_equal(got[:, :, 2], px[:, :, 0])


def test_gray_alpha_broadcasts():
    px = _rand(3, 3, 2, seed=9)
    got = decode_png(encode_png(px, 4, [4, 4, 4]))
    assert np.array_equal(got[:, :, 0], px[:, :, 0])


def test_palette_expands():
    palette = _rand(1, 16, 3, seed=13).reshape(16, 3)
    idx = (_rand(5, 5, 1, seed=14) % 16).astype(np.uint8)
    got = decode_png(encode_png(idx, 3, [0, 1, 2, 3, 4], palette=palette))
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_single_pixel_and_single_row():
    px = np.array([[[200, 10, 99]]], dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, 2, [4])), px)
    row = _rand(1, 9, 3, seed=17)
    assert np.array_equal(decode_png(encode_png(row, 2, [1])), row)


def test_interlaced_raises():
    px = _rand(2, 2, 3, seed=1)
    with pytest.raises(NotImplementedError):
        decode_png(encode_png(px, 2, [0, 0], interlace=1))


def test_not_png_raises():
    with pytest.raises(ValueError):
        decode_png(b"BMnot-a-png")


def test_truncated_stream_raises():
    px = _rand(3, 3, 3, seed=2)
    payload = encode_png(px, 2, [0, 0, 0])
    # corrupt the IHDR height to claim an extra row
    ih = payload.index(b"IHDR")
    bad = bytearray(payload)
    struct.pack_into(">I", bad, ih + 8, 4)
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_decode_image_dispatches_png():
    from ferret_spark.pipeline import decode_image

    px = _rand(4, 4, 3, seed=23)
    got = decode_image(encode_png(px, 2, [0, 1, 2, 4]))
    assert np.array_equal(got, px)
