"""Dependency-free image decoding: PNG / PPM / BMP -> u8 RGB HWC.

The reference vendors stb_image (7,987 LoC, /root/reference/stb_image.h,
used at mobilevit/main.cpp:522) precisely so image loading needs no external
library. This module is the same capability for this framework: stdlib-only
(zlib + numpy) decoders for the formats that matter in practice, used by
``utils.image.load_image`` before falling back to PIL (which then remains an
optional convenience for exotic formats, not a hard dependency).

Supported:
* PNG — 8-bit gray / gray+alpha / RGB / RGBA / palette, all five scanline
  filters, non-interlaced (interlaced falls back to PIL).
* JPEG — baseline sequential DCT (utils/jpeg.py; progressive falls back
  to PIL).
* PPM — binary P6 (maxval <= 255) and ascii P3.
* BMP — uncompressed 24/32-bit bottom-up or top-down.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def decode(data: bytes) -> np.ndarray:
    """Sniff + decode an in-memory image file to u8 RGB (H, W, 3)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] in (b"P6", b"P3"):
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"\xff\xd8":
        from ggml_experiments_tpu.utils.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError(
        "unrecognized image format (PNG/JPEG/PPM/BMP supported natively)"
    )


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: only 8-bit supported natively (got {bit_depth})")
    if interlace:
        raise ValueError("PNG: interlaced images not supported natively")
    nch = _PNG_CHANNELS.get(color_type)
    if nch is None:
        raise ValueError(f"PNG: unknown color type {color_type}")

    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG: truncated pixel data")
    rows = np.frombuffer(raw[: height * (stride + 1)], np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    recon = None
    try:  # native fast path (runtime/): Sub/Avg/Paeth are sequential per pixel
        from ggml_experiments_tpu import runtime

        recon = runtime.png_unfilter(rows[:, 1:], filters, nch)
    except Exception:
        recon = None
    if recon is None:
        recon = _png_unfilter(rows[:, 1:].astype(np.int32), filters, nch)

    img = recon.reshape(height, width, nch)
    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        return palette[img[..., 0]]
    if nch == 1:  # gray
        return np.repeat(img, 3, axis=-1)
    if nch == 2:  # gray + alpha
        return np.repeat(img[..., :1], 3, axis=-1)
    return np.ascontiguousarray(img[..., :3])


def _png_unfilter(rows: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters. rows: (H, W*bpp) int32."""
    h, stride = rows.shape
    out = np.zeros((h, stride), np.int32)
    zero = np.zeros(stride, np.int32)
    for y in range(h):
        raw = rows[y]
        up = out[y - 1] if y else zero
        f = int(filters[y])
        if f == 0:  # None
            out[y] = raw
        elif f == 2:  # Up
            out[y] = (raw + up) & 0xFF
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]  (per-channel cumsum)
            r = raw.reshape(-1, bpp)
            out[y] = np.mod(np.cumsum(r, axis=0, dtype=np.int64), 256).reshape(stride)
        elif f == 3:  # Average
            row = out[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (raw[x] + ((left + up[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = up[x]
                c = up[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (raw[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter byte {f}")
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# PPM (P6 binary / P3 ascii)
# ---------------------------------------------------------------------------

def decode_ppm(data: bytes) -> np.ndarray:
    tokens = []
    pos = 0
    while len(tokens) < 4:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("PPM: 16-bit maxval not supported")
    if magic == b"P6":
        pos += 1  # single whitespace after maxval
        px = np.frombuffer(data[pos : pos + w * h * 3], np.uint8)
    elif magic == b"P3":
        px = np.array(data[pos:].split(), np.int64).astype(np.uint8)[: w * h * 3]
    else:
        raise ValueError(f"PPM: unknown magic {magic!r}")
    if px.size < w * h * 3:
        raise ValueError("PPM: truncated pixel data")
    return px.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("BMP: bad magic")
    pixel_offset = struct.unpack("<I", data[10:14])[0]
    header_size = struct.unpack("<I", data[14:18])[0]
    if header_size < 40:
        raise ValueError("BMP: ancient header not supported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"BMP: only uncompressed 24/32-bit supported (bpp={bpp})")
    flip = h > 0
    h = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    px = np.frombuffer(data[pixel_offset : pixel_offset + stride * h], np.uint8)
    px = px.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    rgb = px[..., 2::-1]  # BGR(A) -> RGB
    return np.ascontiguousarray(rgb[::-1] if flip else rgb)
