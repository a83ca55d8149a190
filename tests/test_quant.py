"""Unit tests for Q8_0/Q4_0 block quantization and the fused matmul kernel.

Covers SURVEY.md §4's plan item (b): kernels vs jnp references, including the
Pallas fused dequant+matmul vs naive dequantize-then-matmul.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu import quant


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("qtype", ["q8_0", "q4_0"])
@pytest.mark.parametrize("shape", [(64, 128), (256, 3072), (1024, 66), (144, 144), (100, 30)])
def test_quantize_roundtrip_error(rng, qtype, shape):
    w = _rand(rng, *shape)
    qt = quant.quantize(w, qtype)
    assert qt.shape == shape
    wd = np.asarray(quant.dequantize(qt))
    assert wd.shape == shape
    # per-block bound: q8_0 |err| <= |d|/2; q4_0 |err| <= |d| (the -absmax
    # element lands on the clipped q=15 slot, one full step away)
    blk = quant.BLOCK
    k, n = shape
    kp = ((k + blk - 1) // blk) * blk
    wp = np.zeros((kp, n), np.float32)
    wp[:k] = w
    absmax = np.abs(wp.reshape(kp // blk, blk, n)).max(axis=1)
    bound = absmax / 127.0 * 0.5 + 1e-6 if qtype == "q8_0" else absmax / 8.0 + 1e-6
    err = np.abs(wd - w).reshape(-1, n)
    err_blocks = np.abs(wp - np.pad(wd, ((0, kp - k), (0, 0)))).reshape(kp // blk, blk, n)
    assert np.all(err_blocks.max(axis=1) <= bound + 1e-5), (
        err_blocks.max(),
        bound.max(),
    )
    del err


@pytest.mark.parametrize("qtype", ["q8_0", "q4_0"])
def test_q4_extremal_exact(rng, qtype):
    # the largest-magnitude weight of each block must round-trip (ggml sign trick)
    w = _rand(rng, 64, 128) * 3.0
    qt = quant.quantize(w, qtype)
    wd = np.asarray(quant.dequantize(qt))
    wb = w.reshape(2, 32, 128)
    idx = np.abs(wb).argmax(axis=1)
    ext = np.take_along_axis(wb, idx[:, None, :], axis=1)[:, 0, :]
    ext_d = np.take_along_axis(wd.reshape(2, 32, 128), idx[:, None, :], axis=1)[:, 0, :]
    rtol = 1e-2 if qtype == "q8_0" else 1e-6  # q4_0 extremal is exact by construction
    np.testing.assert_allclose(ext_d, ext, rtol=rtol, atol=1e-6)


@pytest.mark.parametrize("qtype", ["q8_0", "q4_0"])
@pytest.mark.parametrize(
    "m,k,n",
    [
        (1, 256, 3072),     # GRU input projection, batch 1
        (8, 1024, 3072),    # GRU recurrent projection, batch 8
        (4, 1024, 66),      # GRU vocab head (odd N)
        (16, 144, 144),     # MobileViT hidden (K not 32-multiple)
        (3, 100, 50),       # odd everything
    ],
)
def test_fused_qmatmul_matches_reference(rng, qtype, m, k, n):
    w = _rand(rng, k, n)
    x = _rand(rng, m, k)
    qt = quant.quantize(w, qtype)
    ref = np.asarray(quant.qmatmul_reference(jnp.asarray(x), qt))
    out = np.asarray(quant.qmatmul(jnp.asarray(x), qt))
    assert out.shape == (m, n)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_qmatmul_batched_shapes(rng):
    w = _rand(rng, 64, 32)
    qt = quant.quantize(w, "q8_0")
    x = _rand(rng, 2, 5, 64)
    out = quant.qmatmul(jnp.asarray(x), qt)
    assert out.shape == (2, 5, 32)
    ref = np.einsum("abk,kn->abn", x, np.asarray(quant.dequantize(qt)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("qtype", ["q8_0", "q4_0"])
def test_numpy_block_roundtrip(rng, qtype):
    w = _rand(rng, 144, 66)
    qt = quant.quantize(w, qtype)
    codes, scales = quant.to_numpy_blocks(qt)
    qt2 = quant.from_numpy_blocks(codes, scales, qt.shape, qtype)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(qt)), np.asarray(quant.dequantize(qt2))
    )


def test_quantization_error_scale(rng):
    w = _rand(rng, 256, 128)
    e8 = quant.quantization_error(w, "q8_0")
    e4 = quant.quantization_error(w, "q4_0")
    assert e8 < e4  # 8-bit strictly tighter than 4-bit
    assert e8 < 0.05 and e4 < 0.6


# --- extended ggml-quants family: q4_1 (scale+min), q5_0, q5_1 ---------------


@pytest.mark.parametrize("qtype", ["q4_1", "q5_0", "q5_1"])
@pytest.mark.parametrize("shape", [(64, 128), (256, 3072), (1024, 66), (100, 30)])
def test_extended_roundtrip_error(rng, qtype, shape):
    w = _rand(rng, *shape) + 0.5  # shifted: the asymmetric formats' home turf
    qt = quant.quantize(w, qtype)
    wd = np.asarray(quant.dequantize(qt))
    blk = quant.BLOCK
    k, n = shape
    kp = ((k + blk - 1) // blk) * blk
    wp = np.zeros((kp, n), np.float32)
    wp[:k] = w
    wb = wp.reshape(kp // blk, blk, n)
    if qtype == "q5_0":
        bound = np.abs(wb).max(axis=1) / 16.0  # clipped extremal, one step
    else:
        levels = 15 if qtype == "q4_1" else 31
        bound = (wb.max(axis=1) - wb.min(axis=1)) / levels * 0.5
    err_blocks = np.abs(wp - np.pad(wd, ((0, kp - k), (0, 0)))).reshape(kp // blk, blk, n)
    assert np.all(err_blocks.max(axis=1) <= bound + 1e-5)


def test_extended_error_ordering(rng):
    """More bits / per-block min must pay off: q5_1 < q5_0 < q4_0 and
    q4_1 < q4_0 max error on a shifted (one-sided) weight distribution."""
    w = np.abs(_rand(rng, 256, 128)) + 0.1
    e = {q: quant.quantization_error(w, q) for q in quant.QTYPES}
    assert e["q5_1"] < e["q5_0"] < e["q4_0"]
    assert e["q4_1"] < e["q4_0"]
    assert e["q8_0"] < e["q5_1"]


@pytest.mark.parametrize("qtype", ["q4_1", "q5_0", "q5_1"])
def test_extended_qmatmul_matches_reference(rng, qtype):
    for m, k, n in [(8, 1024, 3072), (4, 1024, 66), (16, 144, 144), (3, 100, 50)]:
        w = _rand(rng, k, n)
        x = _rand(rng, m, k)
        qt = quant.quantize(w, qtype)
        ref = np.asarray(quant.qmatmul_reference(jnp.asarray(x), qt))
        out = np.asarray(quant.qmatmul(jnp.asarray(x), qt))
        assert out.shape == (m, n)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4,
                                   err_msg=f"{qtype} m={m} k={k} n={n}")


def test_q5_0_extremal_exact(rng):
    # sign-flip trick at 5 bits: the extremal weight of each block is exact
    w = _rand(rng, 64, 128) * 3.0
    qt = quant.quantize(w, "q5_0")
    wd = np.asarray(quant.dequantize(qt))
    wb = w.reshape(2, 32, 128)
    idx = np.abs(wb).argmax(axis=1)
    ext = np.take_along_axis(wb, idx[:, None, :], axis=1)[:, 0, :]
    ext_d = np.take_along_axis(wd.reshape(2, 32, 128), idx[:, None, :], axis=1)[:, 0, :]
    np.testing.assert_allclose(ext_d, ext, rtol=1e-6, atol=1e-6)


def test_hibits_pack_unpack_identity(rng):
    from ggml_experiments_tpu.quant.qtensor import _pack_hibits, unpack_hibits

    hi = (rng.integers(0, 2, (3, 32, 128))).astype(np.uint8)
    hb = _pack_hibits(hi)
    assert hb.shape == (12, 128)
    back = np.asarray(unpack_hibits(jnp.asarray(hb)))
    np.testing.assert_array_equal(back.reshape(3, 32, 128), hi.astype(np.float32))


@pytest.mark.parametrize("qtype", ["q4_1", "q5_0", "q5_1"])
def test_extended_numpy_block_roundtrip(rng, qtype):
    w = _rand(rng, 144, 66)
    qt = quant.quantize(w, qtype)
    codes, scales, mins, hibits = quant.to_numpy_blocks(qt)
    qt2 = quant.from_numpy_blocks(codes, scales, qt.shape, qtype, mins=mins, hibits=hibits)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(qt)), np.asarray(quant.dequantize(qt2))
    )


@pytest.mark.parametrize("qtype", ["q4_1", "q5_0", "q5_1"])
def test_extended_checkpoint_roundtrip(rng, qtype, tmp_path):
    from ggml_experiments_tpu.formats import checkpoint

    qt = quant.quantize(_rand(rng, 100, 70), qtype)
    path = str(tmp_path / "q.gxt")
    checkpoint.save(path, {"w": qt})
    back = checkpoint.load_arrays(path)["w"]
    assert back.qtype == qtype and back.shape == (100, 70)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(qt)), np.asarray(quant.dequantize(back))
    )
    assert (back.mins is None) == (qt.mins is None)
    assert (back.hibits is None) == (qt.hibits is None)


# --- q4_k: super-block k-quant (quant/kquant.py) -----------------------------


@pytest.mark.parametrize("shape", [(64, 128), (256, 3072), (1024, 66), (100, 30)])
def test_q4_k_roundtrip(rng, shape):
    w = _rand(rng, *shape) + 0.3
    qt = quant.quantize(w, "q4_k")
    assert qt.qtype == "q4_k" and qt.shape == shape
    assert qt.scales.dtype == jnp.uint8 and qt.mins.dtype == jnp.uint8
    assert qt.supers is not None and qt.supers.dtype == jnp.float32
    wd = np.asarray(quant.dequantize(qt))
    # the searched grid must beat RTN q4_1 on RMSE (same 4-bit codes, finer
    # objective) and of course q4_0
    def rmse(qtype):
        return np.sqrt(np.mean((np.asarray(quant.dequantize(quant.quantize(w, qtype))) - w) ** 2))
    assert np.sqrt(np.mean((wd - w) ** 2)) < rmse("q4_1") * 1.02
    assert np.sqrt(np.mean((wd - w) ** 2)) < rmse("q4_0")


def test_q4_k_bits_per_weight_under_5(rng):
    """The k-quant capacity contract: < 5 stored bits/weight on lane-aligned
    shapes (4 + 0.25 + 0.25 + 0.25 = 4.75)."""
    for shape in [(1024, 3072), (256, 3072), (512, 128)]:
        qt = quant.quantize(_rand(rng, *shape), "q4_k")
        assert qt.bits_per_weight < 5.0, (shape, qt.bits_per_weight)
    # and strictly below the classic 4-bit formats' stored footprint
    w = _rand(rng, 1024, 3072)
    assert (quant.quantize(w, "q4_k").nbytes
            < quant.quantize(w, "q4_0").nbytes
            < quant.quantize(w, "q4_1").nbytes
            < quant.quantize(w, "q8_0").nbytes)


def test_q4_k_importance_weighting(rng):
    """Rows marked important reconstruct tighter than the same rows without
    calibration weighting (the AWQ-style diagonal-importance hook)."""
    w = _rand(rng, 256, 128)
    imp = np.ones(256)
    imp[:32] = 1000.0  # first sub-block of every super-block is hot
    qt_u = quant.quantize(w, "q4_k")
    qt_i = quant.quantize(w, "q4_k", importance=imp)
    e_u = np.abs(np.asarray(quant.dequantize(qt_u)) - w)[:32].mean()
    e_i = np.abs(np.asarray(quant.dequantize(qt_i)) - w)[:32].mean()
    assert e_i <= e_u * 1.001, (e_i, e_u)


def test_q4_k_qmatmul_matches_reference(rng):
    for m, k, n in [(8, 1024, 3072), (4, 1024, 66), (16, 144, 144),
                    (3, 100, 50), (2, 1056, 1024)]:  # 1056: ragged-K fallback
        w = _rand(rng, k, n)
        x = _rand(rng, m, k)
        qt = quant.quantize(w, "q4_k")
        ref = np.asarray(quant.qmatmul_reference(jnp.asarray(x), qt))
        out = np.asarray(quant.qmatmul(jnp.asarray(x), qt))
        assert out.shape == (m, n)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4,
                                   err_msg=f"q4_k m={m} k={k} n={n}")


def test_q4_k_numpy_block_roundtrip(rng):
    w = _rand(rng, 300, 66)  # ragged super-block tail (300/256)
    qt = quant.quantize(w, "q4_k")
    codes, scales, mins, supers = quant.to_numpy_blocks(qt)
    qt2 = quant.from_numpy_blocks(codes, scales, qt.shape, "q4_k",
                                  mins=mins, supers=supers)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(qt)), np.asarray(quant.dequantize(qt2))
    )


def test_q4_k_checkpoint_roundtrip(rng, tmp_path):
    from ggml_experiments_tpu.formats import checkpoint

    qt = quant.quantize(_rand(rng, 300, 70), "q4_k")
    path = str(tmp_path / "q.gxt")
    checkpoint.save(path, {"w": qt})
    back = checkpoint.load_arrays(path)["w"]
    assert back.qtype == "q4_k" and back.shape == (300, 70)
    assert back.supers is not None
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(qt)), np.asarray(quant.dequantize(back))
    )


def test_qmatmul_shape_fuzz(rng):
    """Randomized shape sweep across both qtypes and both execution paths
    (Pallas-interpret for large K*N, inline-XLA for small)."""
    import jax.numpy as jnp

    for trial in range(15):
        m = int(rng.integers(1, 48))
        k = int(rng.integers(1, 300))
        n = int(rng.integers(1, 200))
        qtype = list(quant.QTYPES)[trial % len(quant.QTYPES)]
        w = rng.standard_normal((k, n)).astype(np.float32)
        x = rng.standard_normal((m, k)).astype(np.float32)
        qt = quant.quantize(w, qtype)
        out = np.asarray(quant.qmatmul(jnp.asarray(x), qt))
        ref = np.asarray(x) @ np.asarray(quant.dequantize(qt))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3,
                                   err_msg=f"shapes m={m} k={k} n={n} {qtype}")
