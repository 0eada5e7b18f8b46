"""Vendored pure-numpy PNG decoder (stdlib zlib, no external codecs).

Covers the common web/thumbnail shape: non-interlaced, 8-bit-per-sample,
all five scanline filters (None/Sub/Up/Average/Paeth) and all five color
types (grayscale, RGB, palette, gray+alpha, RGBA), multiple IDAT chunks.
Out of scope (raises NotImplementedError, keeping the declared stand-in
path honest): Adam7 interlacing, 1/2/4/16-bit depths.  CRCs are not
verified — this is a decoder for trusted pipeline payloads, not a
validator.

Filter inversion is vectorized where the recurrence allows: Sub is a
per-lane prefix sum (one cumsum), Up is one vectorized add against the
previous row; Average and Paeth genuinely recur on the just-reconstructed
left neighbor, so they walk pixels left-to-right with all channels (and
the full row add) vectorized per step.  PNG spec: RFC 2083 §6.

The media pipeline (pipeline.decode_image) dispatches PNG payloads here,
so the compressed-codec branch executes in environments without Pillow —
Pillow remains the path for JPEG/WebP only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, 3) uint8 RGB array (alpha
    dropped, palette expanded, grayscale broadcast)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    idat: list[bytes] = []
    palette = None
    w = h = None
    bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if bit_depth != 8:
        raise NotImplementedError(f"{bit_depth}-bit PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG without PLTE")
    if not idat:
        raise ValueError("PNG without IDAT")

    bpp = _CHANNELS[color_type]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = raw[y, 1:].astype(np.int32)
        f = int(filters[y])
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            cur = (
                np.cumsum(line.reshape(w, bpp).astype(np.int64), axis=0)
                & 0xFF
            ).astype(np.int32).reshape(stride)
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average: recurs on the reconstructed left pixel
            ln = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            cur2 = np.empty((w, bpp), np.int32)
            a = np.zeros(bpp, np.int32)
            for x in range(w):
                a = cur2[x] = (ln[x] + ((a + pv[x]) >> 1)) & 0xFF
            cur = cur2.reshape(stride)
        elif f == 4:  # Paeth
            ln = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            cur2 = np.empty((w, bpp), np.int32)
            a = np.zeros(bpp, np.int32)
            c = np.zeros(bpp, np.int32)
            for x in range(w):
                b = pv[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                a = cur2[x] = (ln[x] + pred) & 0xFF
                c = b
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur

    px = out.astype(np.uint8).reshape(h, w, bpp)
    if color_type == 2:  # RGB
        return px
    if color_type == 6:  # RGBA -> drop alpha
        return px[:, :, :3].copy()
    if color_type == 0:  # grayscale
        return np.repeat(px, 3, axis=2)
    if color_type == 4:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return palette[px[:, :, 0]]  # palette
