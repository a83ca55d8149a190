"""Image loading and preprocessing for MobileViT.

Replaces the reference's vendored stb_image loader + SAM-style bilinear
preprocess (/root/reference/mobilevit/main.cpp:517-601) with PIL + numpy.
The resize replicates the reference's exact semantics — align-corners=False
bilinear sampling of u8 values, rounding each sample back to u8, long side
scaled to ``size`` (the short side leaves the rest of the canvas zero), then
x/255 normalization — so preprocessed pixels match the C++ byte-for-byte.

Also provides the deterministic synthetic test image the reference bakes in
as its golden-test input (main.cpp:681-688).
"""

from __future__ import annotations

import numpy as np


def synthetic_test_image(size: int = 256) -> np.ndarray:
    """The reference's golden-test input: ((y*size*3 + x*3 + c) % 256)/255,
    shape (size, size, 3) float32 (main.cpp:681-688)."""
    idx = np.arange(size * size * 3, dtype=np.int64).reshape(size, size, 3)
    return ((idx % 256) / 255.0).astype(np.float32)


def bilinear_resize_u8(img: np.ndarray, out_h: int, out_w: int, scale: float) -> np.ndarray:
    """Reference-exact bilinear resample of a u8 HWC image (main.cpp:561-598).

    Samples at ``(x + 0.5)*scale - 0.5`` with edge clamping, rounds to u8.
    Only the top-left (out_h, out_w) region is produced. Uses the native C++
    path (runtime/) when available; the numpy below is the reference.
    """
    try:
        from ggml_experiments_tpu import runtime

        native = runtime.bilinear_resize_u8(img, out_h, out_w, scale)
        if native is not None:
            return native
    except Exception:
        pass
    return bilinear_resize_u8_py(img, out_h, out_w, scale)


def bilinear_resize_u8_py(img: np.ndarray, out_h: int, out_w: int, scale: float) -> np.ndarray:
    """Pure-numpy reference implementation (fallback + native-parity oracle)."""
    h, w, c = img.shape
    ys = np.arange(out_h, dtype=np.float32)
    xs = np.arange(out_w, dtype=np.float32)
    sy = (ys + 0.5) * scale - 0.5
    sx = (xs + 0.5) * scale - 0.5
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    dy = (sy - y0).astype(np.float32)[:, None, None]
    dx = (sx - x0).astype(np.float32)[None, :, None]
    f = img.astype(np.float32)
    v00 = f[y0][:, x0]
    v01 = f[y0][:, x1]
    v10 = f[y1][:, x0]
    v11 = f[y1][:, x1]
    v0 = v00 * (1 - dx) + v01 * dx
    v1 = v10 * (1 - dx) + v11 * dx
    v = v0 * (1 - dy) + v1 * dy
    # std::round semantics (half away from zero) — np.round is half-to-even
    return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)


def preprocess(
    img_u8: np.ndarray,
    size: int = 256,
    mean: tuple = (0.0, 0.0, 0.0),
    std: tuple = (255.0, 255.0, 255.0),
) -> np.ndarray:
    """u8 HWC image -> (size, size, 3) float32, reference-equivalent.

    Long side scales to ``size``; the uncovered margin stays zero; each
    channel is (v - mean)/std (defaults = the reference's active values; SAM
    means are commented out there, main.cpp:556-559).

    Layout note: the reference writes resized rows *packed* at stride
    ``out_w`` into a ``size``-wide buffer (main.cpp: ``i = 3*(y*nx3+x)+c``),
    so for portrait inputs (out_w < size) its rows wrap diagonally across the
    canvas — a reference bug. We deliberately diverge: rows land at their
    natural (y, x) canvas positions. Byte-for-byte parity with the C++ holds
    for landscape/square inputs, where the strides coincide.
    """
    h, w, _ = img_u8.shape
    scale = max(h, w) / float(size)
    out_h = int(h / scale + 0.5)
    out_w = int(w / scale + 0.5)
    resized = bilinear_resize_u8(img_u8, out_h, out_w, scale)
    canvas = np.zeros((size, size, 3), np.float32)
    canvas[:out_h, :out_w] = (resized.astype(np.float32) - np.asarray(mean)) / np.asarray(std)
    return canvas


def load_image(path: str) -> np.ndarray:
    """Decode an image file to u8 RGB HWC (stb_image / sam_image_load_from_file
    equivalent, main.cpp:517-535).

    Dependency-free first: the native PNG/PPM/BMP decoders (image_codecs.py —
    this framework's stb_image counterpart) handle the common formats with
    stdlib zlib + numpy only; PIL is an optional fallback for anything else
    (JPEG, interlaced PNG, ...)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        from ggml_experiments_tpu.utils import image_codecs

        return image_codecs.decode(data)
    except ValueError:
        pass
    except Exception:
        # e.g. zlib.error from a corrupt IDAT stream, struct.error from a
        # truncated header — PIL may still handle files the native decoders
        # cannot, so any native-decode failure falls through to it
        pass
    try:
        import io

        from PIL import Image
    except ImportError as ex:  # pragma: no cover
        raise ValueError(
            f"{path}: not natively decodable (PNG/PPM/BMP) and PIL unavailable"
        ) from ex
    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def preprocess_canvas_u8(img_u8: np.ndarray, size: int = 256) -> np.ndarray:
    """The resize-and-paste half of :func:`preprocess`, kept u8.

    For serving (serving/vision.py ``transport='u8'``): the host ships the
    u8 canvas (4x fewer bytes than the f32 image — host->device bandwidth
    is the e2e wall for image serving) and the device applies the
    reference's x/255 normalization inside the jitted forward. Identical
    numerics to ``preprocess`` at the default mean/std (0, 255)."""
    h, w, _ = img_u8.shape
    scale = max(h, w) / float(size)
    out_h = int(h / scale + 0.5)
    out_w = int(w / scale + 0.5)
    resized = bilinear_resize_u8(img_u8, out_h, out_w, scale)
    canvas = np.zeros((size, size, 3), np.uint8)
    canvas[:out_h, :out_w] = resized
    return canvas


def load_and_preprocess(path: str, size: int = 256) -> np.ndarray:
    return preprocess(load_image(path), size=size)
