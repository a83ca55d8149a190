"""Native (C++) runtime vs numpy reference: quant codecs + format parsers."""

import numpy as np
import pytest

from ggml_experiments_tpu import quant, runtime
from ggml_experiments_tpu.formats.ggml_named import read_named_tensors_py
from ggml_experiments_tpu.formats.gru_bin import read_tensors_py

import os

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    not runtime.build_native(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("shape", [(64, 128), (100, 30), (1024, 66)])
def test_native_q8_matches_numpy(rng, shape):
    w = rng.standard_normal(shape).astype(np.float32)
    codes_n, scales_n = runtime.quantize_q8_0(w)
    qt = quant.quantize(w, "q8_0")
    k, n = shape
    np.testing.assert_array_equal(codes_n, np.asarray(qt.codes)[:, :n])
    np.testing.assert_allclose(scales_n, np.asarray(qt.scales)[:, :n], rtol=1e-6)


@pytest.mark.parametrize("shape", [(64, 128), (100, 30), (256, 144)])
def test_native_q4_matches_numpy(rng, shape):
    w = rng.standard_normal(shape).astype(np.float32)
    codes_n, scales_n = runtime.quantize_q4_0(w)
    qt = quant.quantize(w, "q4_0")
    k, n = shape
    np.testing.assert_array_equal(codes_n, np.asarray(qt.codes)[:, :n])
    np.testing.assert_allclose(scales_n, np.asarray(qt.scales)[:, :n], rtol=1e-6)


@pytest.mark.parametrize("qtype", ["q8_0", "q4_0"])
def test_native_dequant_roundtrip(rng, qtype):
    w = rng.standard_normal((96, 128)).astype(np.float32)
    codes, scales = (
        runtime.quantize_q8_0(w) if qtype == "q8_0" else runtime.quantize_q4_0(w)
    )
    wd = runtime.dequantize(codes, scales, qtype)
    want = np.asarray(quant.dequantize(quant.quantize(w, qtype)))
    np.testing.assert_allclose(wd[:96], want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("qtype", ["q4_1", "q5_0", "q5_1"])
@pytest.mark.parametrize("shape", [(64, 128), (100, 30), (256, 144)])
def test_native_extended_matches_numpy(rng, qtype, shape):
    """New-format codecs vs the EXPLICIT numpy implementation (not via
    quant.quantize, which would itself take the native path)."""
    from ggml_experiments_tpu.quant.qtensor import (
        _blockify, _pack_hibits, _pack_nibbles,
        _quantize_offset_arrays, _quantize_q5_0_arrays,
    )

    w = rng.standard_normal(shape).astype(np.float32) + 0.4
    wb, kp, np_ = _blockify(w)
    wb = wb[..., : shape[1]]  # native codecs return unpadded-N planes
    if qtype == "q4_1":
        got = runtime.quantize_q4_1(w)
        q, d, mn = _quantize_offset_arrays(wb, 15)
        want = (_pack_nibbles(q), d, mn)
    elif qtype == "q5_0":
        got = runtime.quantize_q5_0(w)
        q, d = _quantize_q5_0_arrays(wb)
        want = (_pack_nibbles(q & 0xF), _pack_hibits(q >> 4), d)
    else:
        got = runtime.quantize_q5_1(w)
        q, d, mn = _quantize_offset_arrays(wb, 31)
        want = (_pack_nibbles(q & 0xF), _pack_hibits(q >> 4), d, mn)
    assert len(got) == len(want)
    for g, x in zip(got, want):
        np.testing.assert_array_equal(g, x)


@pytest.mark.parametrize("qtype", ["q4_1", "q5_0", "q5_1"])
def test_native_extended_dequant_roundtrip(rng, qtype):
    w = rng.standard_normal((96, 128)).astype(np.float32)
    mins = hibits = None
    if qtype == "q4_1":
        codes, scales, mins = runtime.quantize_q4_1(w)
    elif qtype == "q5_0":
        codes, hibits, scales = runtime.quantize_q5_0(w)
    else:
        codes, hibits, scales, mins = runtime.quantize_q5_1(w)
    wd = runtime.dequantize(codes, scales, qtype, mins=mins, hibits=hibits)
    want = np.asarray(quant.dequantize(quant.quantize(w, qtype)))
    # atol one bf16-ULP above zero: -O3 contracts q*d + m to an FMA, which
    # differs from numpy's separate mul+add by 1 f32 ULP on ~0.02% of values
    np.testing.assert_allclose(wd[:96], want, rtol=1e-5, atol=5e-7)


def test_native_named_parser_matches_python():
    path = os.path.join(GOLD, "mobilevit_tiny.ggml")
    ours = runtime.read_named_tensors_native(path)
    ref = read_named_tensors_py(path)
    assert ours.keys() == ref.keys()
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k])


def test_native_gru_parser_matches_python():
    path = os.path.join(GOLD, "gru_small.bin")
    ours = runtime.read_gru_bin_native(path)
    ref = read_tensors_py(path)
    assert len(ours) == len(ref) == 6
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


def test_native_parser_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.ggml"
    bad.write_bytes(b"\xff\xff\xff\xff0123456789")
    with pytest.raises(ValueError, match="native parse error"):
        runtime.read_named_tensors_native(str(bad))


def test_native_bilinear_matches_numpy(rng):
    from ggml_experiments_tpu.utils.image import bilinear_resize_u8_py

    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    for out_h, out_w, scale in [(16, 23, 2.3), (37, 53, 1.0), (7, 10, 5.2)]:
        got = runtime.bilinear_resize_u8(img, out_h, out_w, scale)
        want = bilinear_resize_u8_py(img, out_h, out_w, scale)
        diff = np.abs(got.astype(int) - want.astype(int))
        # f32 op-order differs between the scalar C++ loop and vectorized
        # numpy; exact-.5 ties may land one code apart (<0.1% of pixels)
        assert diff.max() <= 1 and (diff != 0).mean() < 1e-3, (
            diff.max(), (diff != 0).mean())


def test_native_png_unfilter_matches_python(rng):
    """All five filter types, random data: native == pure-python reference."""
    from ggml_experiments_tpu import runtime
    from ggml_experiments_tpu.utils.image_codecs import _png_unfilter

    h, stride, bpp = 37, 61 * 3, 3
    raw = rng.integers(0, 256, (h, stride), np.uint8)
    filters = rng.integers(0, 5, h, np.uint8)
    want = _png_unfilter(raw.astype(np.int32), filters, bpp)
    got = runtime.png_unfilter(raw, filters, bpp)
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_native_q4_k_dequant_matches_python(rng):
    """The native q4_k decoder vs the numpy reference (quantization itself
    stays numpy-side — the grid search/GPTQ are host algorithms)."""
    w = rng.standard_normal((300, 130)).astype(np.float32)  # ragged K and N
    qt = quant.quantize(w, "q4_k")
    codes, scales, mins, supers = quant.to_numpy_blocks(qt)
    wd = runtime.dequantize(codes, scales, "q4_k", mins=mins, supers=supers)
    if wd is None:
        pytest.skip("native lib unavailable")
    want = np.asarray(quant.dequantize(qt))
    # FMA contraction tolerance, as for the other extended codecs
    np.testing.assert_allclose(wd[:300, :130], want, rtol=1e-5, atol=5e-7)
