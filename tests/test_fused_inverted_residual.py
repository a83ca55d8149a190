"""Fused inverted-residual Pallas kernel vs the unfused XLA chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_experiments_tpu.models.mobilevit import InvertedResidualParams
from ggml_experiments_tpu.ops.conv import ConvBNAct
from ggml_experiments_tpu.ops.fused_inverted_residual import inverted_residual_fused
from ggml_experiments_tpu.ops.norm import FoldedBN


def _mk_conv(rng, kh, kw, cin, cout, stride=1, dw=False, act="silu"):
    k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.2, jnp.float32)
    bn = FoldedBN(
        scale=jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
        bias=jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32),
    )
    return ConvBNAct(kernel=k, bn=bn, activation=act, stride=stride, depthwise=dw)


def _mk_block(rng, c, e, cout, stride, resid, fused=False):
    return InvertedResidualParams(
        expand_1x1=_mk_conv(rng, 1, 1, c, e),
        conv_3x3=_mk_conv(rng, 3, 3, 1, e, stride=stride, dw=True),
        reduce_1x1=_mk_conv(rng, 1, 1, e, cout, act="none"),
        use_residual=resid,
        fused=fused,
    )


@pytest.mark.parametrize(
    "stride,resid,c,e,cout",
    [(1, True, 8, 32, 8), (1, False, 8, 32, 16), (2, False, 8, 32, 16)],
)
def test_fused_matches_unfused(rng, stride, resid, c, e, cout):
    p = _mk_block(rng, c, e, cout, stride, resid)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    want = np.asarray(p(x, compute_dtype=jnp.bfloat16), np.float32)
    got = np.asarray(inverted_residual_fused(p, x, compute_dtype=jnp.bfloat16), np.float32)
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel


def test_fused_flag_dispatches(rng):
    """fused=True blocks route bf16 calls through the kernel (same numbers)
    and f32 calls through the unfused parity path."""
    pf = _mk_block(rng, 8, 32, 8, 1, True, fused=True)
    pu = InvertedResidualParams(
        expand_1x1=pf.expand_1x1, conv_3x3=pf.conv_3x3, reduce_1x1=pf.reduce_1x1,
        use_residual=True, fused=False,
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    got = np.asarray(pf(x, compute_dtype=jnp.bfloat16), np.float32)
    want = np.asarray(pu(x, compute_dtype=jnp.bfloat16), np.float32)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel
    # f32 must be bit-identical to the unfused path (it IS the unfused path)
    np.testing.assert_array_equal(
        np.asarray(pf(x, compute_dtype=jnp.float32)),
        np.asarray(pu(x, compute_dtype=jnp.float32)),
    )


def test_full_model_fused_ir_loader_flag(rng):
    """from_named_tensors(fused_ir=True) produces the same features as the
    unfused model at bf16 (tiny config, interpret mode on CPU)."""
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
    )

    cfg = MobileViTConfig(
        image_size=64, neck_hidden_sizes=(4, 8, 12, 16, 20, 24, 48),
        hidden_sizes=(12, 16, 20), num_transformer_layers=(1, 1, 1),
    )
    tensors = random_named_tensors(cfg, seed=5)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    base = from_named_tensors(tensors, cfg)
    fused = from_named_tensors(tensors, cfg, fused_ir=True)
    want = np.asarray(extract_features(base, jnp.asarray(img), compute_dtype=jnp.bfloat16))
    got = np.asarray(extract_features(fused, jnp.asarray(img), compute_dtype=jnp.bfloat16))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.05, rel
