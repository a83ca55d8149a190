"""AOT deployment artifacts (serving/aot): export -> file -> reload -> call.

The deployable counterpart of the reference's ship-a-compiled-binary story
(mobilevit/main.cpp): the traced program is frozen as StableHLO, so the
serving host replays it without model code or tracing.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu.formats.gru_bin import load_gru_params
from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.serving import aot

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
BIN = os.path.join(GOLD, "gru_small.bin")


@pytest.mark.parametrize("qtype", [None, "q8_0", "q5_1"])
def test_gru_decode_artifact_roundtrip(tmp_path, qtype):
    params = load_gru_params(BIN, qtype=qtype)
    path = str(tmp_path / "decode.gxa")
    aot.export_gru_decode(params, batch=2, prompt_len=8, total_steps=20, path=path)
    meta, exp = aot.load_artifact(path)
    assert meta["kind"] == "gru-decode" and meta["total_steps"] == 20

    prompt = jnp.zeros((2, 8), jnp.int32).at[:, :3].set(jnp.asarray([[5, 9, 3]] * 2))
    lengths = jnp.full((2,), 3, jnp.int32)
    got = np.asarray(exp.call(params, prompt, lengths))
    want = np.asarray(
        jax.jit(gru_textgen.generate, static_argnames=("total_steps",))(
            params, prompt, lengths, total_steps=20
        )
    )
    np.testing.assert_array_equal(got, want)


def test_artifact_serves_other_weights_same_shape(tmp_path, rng):
    """One artifact, any weight file with matching shapes: the program is
    shape-specialized, not weight-specialized."""
    params = load_gru_params(BIN)
    path = str(tmp_path / "decode.gxa")
    aot.export_gru_decode(params, batch=1, prompt_len=4, total_steps=10, path=path)
    _, exp = aot.load_artifact(path)

    other = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32) * 0.2
        ) if a.dtype == jnp.float32 else a,
        params,
    )
    prompt = jnp.asarray([[5, 9, 3, 0]], jnp.int32)
    lengths = jnp.asarray([3], jnp.int32)
    got = np.asarray(exp.call(other, prompt, lengths))
    want = np.asarray(gru_textgen.generate(other, prompt, lengths, 10))
    np.testing.assert_array_equal(got, want)


def test_mobilevit_features_artifact(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_mobilevit import TINY

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.models.mobilevit import extract_features, from_named_tensors

    tensors = read_named_tensors(os.path.join(GOLD, "mobilevit_tiny.ggml"))
    params = from_named_tensors(tensors, TINY)
    path = str(tmp_path / "feat.gxa")
    aot.export_mobilevit_features(params, batch=1, image_size=TINY.image_size, path=path)
    meta, exp = aot.load_artifact(path)
    assert meta["kind"] == "mobilevit-features"

    g = np.load(os.path.join(GOLD, "mobilevit_tiny.npz"))
    img = jnp.asarray(g["image"])[None]
    got = np.asarray(exp.call(params, img))
    want = np.asarray(extract_features(params, img))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.gxa")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="not a GXA1"):
        aot.load_artifact(path)
