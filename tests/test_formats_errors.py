"""Error-path and aux coverage: format parsers, checkpoint manager, image, metrics."""

import struct

import numpy as np
import pytest

from ggml_experiments_tpu.formats.checkpoint import CheckpointManager, load_arrays
from ggml_experiments_tpu.formats.ggml_named import read_named_tensors_py
from ggml_experiments_tpu.formats.gru_bin import load_gru_params, read_tensors_py
from ggml_experiments_tpu.utils.image import preprocess, synthetic_test_image


def test_named_parser_truncated_data(tmp_path):
    p = tmp_path / "t.ggml"
    with open(p, "wb") as f:
        name = b"w:0"
        f.write(struct.pack("<i", len(name)))
        f.write(name)
        f.write(struct.pack("<i", 2))
        f.write(struct.pack("<ii", 4, 4))
        np.zeros(3, "<f4").tofile(f)  # 3 of 16 floats
    with pytest.raises(EOFError, match="truncated"):
        read_named_tensors_py(str(p))


def test_named_parser_bad_ndims(tmp_path):
    p = tmp_path / "t.ggml"
    with open(p, "wb") as f:
        f.write(struct.pack("<i", 1))
        f.write(b"w")
        f.write(struct.pack("<i", 9))  # implausible n_dims
    with pytest.raises(ValueError, match="implausible n_dims"):
        read_named_tensors_py(str(p))


def test_gru_bin_truncated(tmp_path):
    p = tmp_path / "g.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<i", 2))
        f.write(struct.pack("<ii", 4, 4))
        np.zeros(5, "<f4").tofile(f)
    with pytest.raises(EOFError, match="truncated"):
        read_tensors_py(str(p))


def test_load_gru_params_wrong_count(tmp_path):
    p = tmp_path / "g.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<i", 4))
        np.zeros(4, "<f4").tofile(f)
    with pytest.raises(ValueError, match="expected 6 tensors"):
        load_gru_params(str(p))


def test_checkpoint_manager_max_mode(tmp_path):
    import jax.numpy as jnp

    m = CheckpointManager(str(tmp_path / "c.gxt"), best=-float("inf"), mode="max")
    assert m.maybe_save({"w": jnp.ones(1)}, 0.5)
    assert not m.maybe_save({"w": jnp.zeros(1)}, 0.4)
    assert m.maybe_save({"w": jnp.full((1,), 2.0)}, 0.9)
    np.testing.assert_array_equal(
        np.asarray(load_arrays(str(tmp_path / "c.gxt"))["w"]), [2.0]
    )


def test_preprocess_wide_image_margin_zero():
    """Non-square input: long side -> 256, short side leaves a zero margin
    (the reference resizes into a zeroed canvas, main.cpp:544-547)."""
    img = np.full((100, 200, 3), 255, np.uint8)
    out = preprocess(img, size=256)
    assert out.shape == (256, 256, 3)
    out_h = int(100 / (200 / 256) + 0.5)
    assert np.allclose(out[:out_h, :, :], 1.0)
    assert (out[out_h:, :, :] == 0).all()


def test_synthetic_image_size_param():
    assert synthetic_test_image(64).shape == (64, 64, 3)


def _every_truncation(data, tmp_path, reader, valid_prefixes):
    """Reader must either return a clean whole-record prefix or raise a
    controlled error (ValueError/EOFError) at EVERY truncation point —
    never a struct.error, reshape crash, or silently dropped tail."""
    p = tmp_path / "trunc.bin"
    for n in range(len(data) + 1):
        p.write_bytes(data[:n])
        try:
            reader(str(p))
        except (ValueError, EOFError, KeyError):
            assert n not in valid_prefixes, f"valid prefix {n} rejected"
        else:
            assert n in valid_prefixes, f"truncation at {n} silently accepted"


def test_named_reader_truncation_fuzz(tmp_path):
    """Both the python and native weight.ggml parsers agree on the
    truncation contract at every byte boundary (the native fseek-past-EOF
    and partial-trailing-header holes are regression-pinned here)."""
    from ggml_experiments_tpu.formats.ggml_named import (
        read_named_tensors, read_named_tensors_py, write_named_tensors,
    )

    tensors = [("a/kernel:0", np.ones((3, 4), np.float32)),
               ("b/bias:0", np.arange(5, dtype=np.float32))]
    p = tmp_path / "w.ggml"
    write_named_tensors(str(p), tensors)
    data = p.read_bytes()
    rec1 = 4 + len("a/kernel:0") + 4 + 2 * 4 + 12 * 4
    valid = {0, rec1, len(data)}
    _every_truncation(data, tmp_path, read_named_tensors_py, valid)
    _every_truncation(data, tmp_path, read_named_tensors, valid)


def test_gru_bin_truncation_fuzz(tmp_path):
    from ggml_experiments_tpu.formats.gru_bin import read_tensors, read_tensors_py

    data = b""
    for arr in (np.ones((2, 3), np.float32), np.arange(4, dtype=np.float32)):
        data += struct.pack("<i", arr.ndim)
        for d in reversed(arr.shape):
            data += struct.pack("<i", d)
        data += arr.astype("<f4").tobytes()
    rec1 = 4 + 2 * 4 + 6 * 4
    valid = {0, rec1, len(data)}
    _every_truncation(data, tmp_path, read_tensors_py, valid)
    _every_truncation(data, tmp_path, read_tensors, valid)


def test_named_reader_corruption(tmp_path):
    """Hostile headers (huge/negative name_len, ndims, dims) raise
    controlled errors on both parser paths — no giant allocations."""
    from ggml_experiments_tpu.formats.ggml_named import (
        read_named_tensors, read_named_tensors_py, write_named_tensors,
    )

    p = tmp_path / "w.ggml"
    write_named_tensors(str(p), [("a/kernel:0", np.ones((3, 4), np.float32))])
    data = p.read_bytes()
    patches = [
        struct.pack("<i", 1 << 30) + data[4:],
        struct.pack("<i", -5) + data[4:],
        data[:14] + struct.pack("<i", 100) + data[18:],
        data[:18] + struct.pack("<i", -3) + data[22:],
        data[:18] + struct.pack("<i", 1 << 30) + data[22:],
    ]
    q = tmp_path / "bad.ggml"
    for patch in patches:
        q.write_bytes(patch)
        for reader in (read_named_tensors_py, read_named_tensors):
            with pytest.raises((ValueError, EOFError)):
                reader(str(q))
