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
