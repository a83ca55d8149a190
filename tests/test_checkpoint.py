"""Native checkpoint container edge cases (GXT1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu import quant
from ggml_experiments_tpu.formats import checkpoint


def test_roundtrip_mixed_tree(tmp_path, rng):
    tree = {
        "a": jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32)),
        "nested": {
            "q": quant.quantize(rng.standard_normal((64, 32)).astype(np.float32), "q8_0"),
            "ints": jnp.arange(5, dtype=jnp.int32),
            "none": None,
        },
        "bf16": jnp.asarray(rng.standard_normal((8, 16)), jnp.bfloat16),
    }
    path = str(tmp_path / "ckpt.gxt")
    checkpoint.save(path, tree)
    flat = checkpoint.load_arrays(path)
    np.testing.assert_array_equal(np.asarray(flat["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(flat["nested/ints"]), np.arange(5))
    # None is an empty pytree: no entry is stored; templates re-supply it
    assert "nested/none" not in flat
    assert flat["bf16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(flat["bf16"], np.float32), np.asarray(tree["bf16"], np.float32)
    )
    q = flat["nested/q"]
    assert q.qtype == "q8_0" and q.shape == (64, 32)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(q)), np.asarray(quant.dequantize(tree["nested"]["q"]))
    )


def test_load_into_template(tmp_path, rng):
    tree = {"w": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32)), "b": None}
    path = str(tmp_path / "c.gxt")
    checkpoint.save(path, tree)
    template = {"w": jnp.zeros((3, 3)), "b": None}
    restored = checkpoint.load_into(path, template)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(tree["w"]))


def test_load_into_missing_key(tmp_path):
    path = str(tmp_path / "c.gxt")
    checkpoint.save(path, {"w": jnp.zeros((2,))})
    with pytest.raises(KeyError, match="missing tensor"):
        checkpoint.load_into(path, {"w": jnp.zeros((2,)), "extra": jnp.zeros((1,))})


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gxt"
    p.write_bytes(b"NOPE" + b"\0" * 16)
    with pytest.raises(ValueError, match="not a GXT1"):
        checkpoint.load_arrays(str(p))


def test_manager_best_only(tmp_path):
    mgr = checkpoint.CheckpointManager(str(tmp_path / "best.gxt"))
    assert mgr.maybe_save({"w": jnp.ones((2,))}, 1.0)
    assert not mgr.maybe_save({"w": jnp.full((2,), 9.0)}, 2.0)   # worse: not saved
    restored = checkpoint.load_arrays(str(tmp_path / "best.gxt"))
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(2))
    assert mgr.maybe_save({"w": jnp.zeros((2,))}, 0.5)           # better: saved
