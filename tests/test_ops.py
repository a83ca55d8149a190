"""Unit tests for the op surface vs numpy references (SURVEY.md §4 plan (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu import ops, quant


def _rand(rng, *shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def test_sigmoid_is_finite_at_zero():
    # the reference's silu(x)/x sigmoid NaNs at x=0 (rnn_text_generation.cpp:51-55)
    x = jnp.array([0.0, -5.0, 5.0])
    y = np.asarray(ops.sigmoid(x))
    assert np.all(np.isfinite(y))
    np.testing.assert_allclose(y, 1.0 / (1.0 + np.exp(-np.asarray(x))), rtol=1e-5, atol=1e-7)


def test_layer_norm_matches_numpy(rng):
    x = _rand(rng, 4, 16, 144)
    g = _rand(rng, 144)
    b = _rand(rng, 144)
    got = np.asarray(ops.layer_norm(jnp.asarray(x), g, b, eps=1e-5))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-5) * g + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fold_batchnorm_equivalent(rng):
    c = 32
    x = _rand(rng, 2, 8, 8, c)
    gamma, beta = _rand(rng, c), _rand(rng, c)
    mean, var = _rand(rng, c), np.abs(_rand(rng, c)) + 0.5
    bn = ops.fold_batchnorm(gamma, beta, mean, var, eps=1e-5)
    got = np.asarray(ops.apply_folded_bn(jnp.asarray(x), bn))
    want = (x - mean) / np.sqrt(var + 1e-5) * gamma + beta
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unfold_fold_roundtrip(rng):
    x = _rand(rng, 2, 8, 8, 5)
    u = ops.unfold(jnp.asarray(x), 2)
    assert u.shape == (2, 4, 16, 5)
    y = ops.fold(u, 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_unfold_ordering_matches_reference_pseudocode(rng):
    # replicate the numpy pseudocode from /root/reference/mobilevit/main.cpp:709-719
    n, oh, ow, c, ps = 2, 4, 6, 3, 2
    feats = _rand(rng, n, oh, ow, c)
    nph, npw = oh // ps, ow // ps
    num_patches = nph * npw
    f = feats.transpose(0, 3, 1, 2)                       # (N, C, OH, OW)
    p = f.reshape(n * c * nph, ps, npw, ps)
    p = p.transpose(0, 2, 1, 3)
    p = p.reshape(n, c, num_patches, ps * ps)
    p = p.transpose(0, 3, 2, 1)                           # (N, patch_area, num_patches, C)
    got = np.asarray(ops.unfold(jnp.asarray(feats), ps))
    np.testing.assert_array_equal(got, p)


def test_conv2d_matches_reference_padding(rng):
    # symmetric (k-1)//2 padding, stride 2 — check shape and value vs naive conv
    x = _rand(rng, 1, 6, 6, 2)
    k = _rand(rng, 3, 3, 2, 4)
    y = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(k), stride=2))
    assert y.shape == (1, 3, 3, 4)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((1, 3, 3, 4), np.float32)
    for oy in range(3):
        for ox in range(3):
            patch = xp[0, oy * 2 : oy * 2 + 3, ox * 2 : ox * 2 + 3, :]
            want[0, oy, ox] = np.tensordot(patch, k, axes=([0, 1, 2], [0, 1, 2]))
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


def test_depthwise_conv2d_matches_per_channel(rng):
    x = _rand(rng, 1, 5, 5, 3)
    k = _rand(rng, 3, 3, 1, 3)
    y = np.asarray(ops.depthwise_conv2d(jnp.asarray(x), jnp.asarray(k)))
    assert y.shape == (1, 5, 5, 3)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for c in range(3):
        want_c = np.zeros((5, 5), np.float32)
        for oy in range(5):
            for ox in range(5):
                want_c[oy, ox] = (xp[0, oy : oy + 3, ox : ox + 3, c] * k[:, :, 0, c]).sum()
        np.testing.assert_allclose(y[0, :, :, c], want_c, rtol=1e-4, atol=1e-4)


def test_gru_cell_matches_numpy(rng):
    b, e, u = 3, 8, 16
    p = ops.GRUCellParams(
        kernel=jnp.asarray(_rand(rng, e, 3 * u)),
        recurrent_kernel=jnp.asarray(_rand(rng, u, 3 * u)),
        bias=jnp.asarray(_rand(rng, 2, 3 * u)),
    )
    x = _rand(rng, b, e)
    h = _rand(rng, b, u)
    got = np.asarray(ops.gru_cell(p, jnp.asarray(x), jnp.asarray(h)))

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    mx = x @ np.asarray(p.kernel) + np.asarray(p.bias)[0]
    mh = h @ np.asarray(p.recurrent_kernel) + np.asarray(p.bias)[1]
    z = sig(mx[:, :u] + mh[:, :u])
    r = sig(mx[:, u : 2 * u] + mh[:, u : 2 * u])
    hh = np.tanh(mx[:, 2 * u :] + r * mh[:, 2 * u :])
    want = z * h + (1 - z) * hh
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gru_sequence_scan_equals_loop(rng):
    b, t, e, u = 2, 7, 8, 16
    p = ops.GRUCellParams(
        kernel=jnp.asarray(_rand(rng, e, 3 * u)),
        recurrent_kernel=jnp.asarray(_rand(rng, u, 3 * u)),
        bias=jnp.asarray(_rand(rng, 2, 3 * u)),
    )
    xs = jnp.asarray(_rand(rng, b, t, e))
    h0 = jnp.zeros((b, u))
    ys, h_last = ops.gru_sequence(p, xs, h0)
    h = h0
    for i in range(t):
        h = ops.gru_cell(p, xs[:, i], h)
        np.testing.assert_allclose(np.asarray(ys[:, i]), np.asarray(h), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h), rtol=1e-5, atol=1e-6)


def test_gru_cell_with_quantized_kernels(rng):
    b, e, u = 2, 32, 64
    kernel = _rand(rng, e, 3 * u, scale=0.1)
    rkernel = _rand(rng, u, 3 * u, scale=0.1)
    bias = _rand(rng, 2, 3 * u, scale=0.1)
    x = _rand(rng, b, e)
    h = _rand(rng, b, u, scale=0.5)
    pf = ops.GRUCellParams(jnp.asarray(kernel), jnp.asarray(rkernel), jnp.asarray(bias))
    pq = ops.GRUCellParams(
        quant.quantize(kernel, "q8_0"), quant.quantize(rkernel, "q8_0"), jnp.asarray(bias)
    )
    hf = np.asarray(ops.gru_cell(pf, jnp.asarray(x), jnp.asarray(h)))
    hq = np.asarray(ops.gru_cell(pq, jnp.asarray(x), jnp.asarray(h)))
    assert np.max(np.abs(hf - hq)) < 0.05  # within quantization delta


def test_attention_matches_numpy(rng):
    b, l, c, heads = 2, 6, 16, 4
    mk = lambda *s: _rand(rng, *s, scale=0.3)
    p = ops.AttentionParams(
        wq=jnp.asarray(mk(c, c)), bq=jnp.asarray(mk(c)),
        wk=jnp.asarray(mk(c, c)), bk=jnp.asarray(mk(c)),
        wv=jnp.asarray(mk(c, c)), bv=jnp.asarray(mk(c)),
        wo=jnp.asarray(mk(c, c)), bo=jnp.asarray(mk(c)),
        num_heads=heads,
    )
    x = mk(b, l, c)
    got = np.asarray(ops.multi_head_attention(p, jnp.asarray(x)))

    dh = c // heads
    q = (x @ np.asarray(p.wq) + np.asarray(p.bq)).reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
    k = (x @ np.asarray(p.wk) + np.asarray(p.bk)).reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
    v = (x @ np.asarray(p.wv) + np.asarray(p.bv)).reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
    s = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
    s = np.exp(s - s.max(-1, keepdims=True))
    s = s / s.sum(-1, keepdims=True)
    ctx = (s @ v).transpose(0, 2, 1, 3).reshape(b, l, c)
    want = ctx @ np.asarray(p.wo) + np.asarray(p.bo)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_linear_jit_with_qtensor(rng):
    w = _rand(rng, 64, 32)
    qt = quant.quantize(w, "q8_0")
    x = jnp.asarray(_rand(rng, 4, 64))

    @jax.jit
    def f(x, qt):
        return ops.linear(x, qt)

    out = np.asarray(f(x, qt))
    ref = np.asarray(x) @ np.asarray(quant.dequantize(qt))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_space_to_depth_stem_matches_conv(rng):
    """s2d stem == stride-2 3x3 stem (identical arithmetic, reassociated)."""
    import jax.numpy as jnp
    from ggml_experiments_tpu.ops.conv import ConvBNAct, space_to_depth_stem
    from ggml_experiments_tpu.ops.norm import fold_batchnorm

    k = _rand(rng, 3, 3, 3, 16, scale=0.3)
    bn = fold_batchnorm(
        jnp.asarray(np.abs(_rand(rng, 16)) + 0.5), jnp.asarray(_rand(rng, 16)),
        jnp.asarray(_rand(rng, 16)), jnp.asarray(np.abs(_rand(rng, 16)) + 0.5),
    )
    stem = ConvBNAct(kernel=jnp.asarray(k), bn=bn, activation="silu", stride=2)
    s2d = space_to_depth_stem(stem)
    x = jnp.asarray(_rand(rng, 2, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(s2d(x)), np.asarray(stem(x)), rtol=1e-5, atol=1e-5
    )


def test_space_to_depth_rejects_wrong_shape(rng):
    import jax.numpy as jnp
    from ggml_experiments_tpu.ops.conv import ConvBNAct, space_to_depth_stem

    with pytest.raises(ValueError, match="stride-2 3x3"):
        space_to_depth_stem(
            ConvBNAct(kernel=jnp.zeros((1, 1, 3, 16)), stride=2)
        )


def test_sampling_top_k(rng):
    from ggml_experiments_tpu.ops import sampling

    logits = jnp.asarray(_rand(rng, 4, 66))
    masked = np.asarray(sampling.apply_top_k(logits, 5))
    assert ((masked > sampling.NEG / 2).sum(axis=-1) == 5).all()
    # surviving entries are exactly the 5 largest
    for row_m, row_l in zip(masked, np.asarray(logits)):
        top5 = set(np.argsort(row_l)[-5:])
        assert set(np.where(row_m > sampling.NEG / 2)[0]) == top5
    with pytest.raises(ValueError, match="top_k"):
        sampling.apply_top_k(logits, 0)


def test_sampling_top_p(rng):
    from ggml_experiments_tpu.ops import sampling

    logits = jnp.asarray(_rand(rng, 3, 66) * 3)
    masked = np.asarray(sampling.apply_top_p(logits, 0.5))
    probs = np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum(-1, keepdims=True)
    for row_m, row_p in zip(masked, probs):
        keep = row_m > sampling.NEG / 2
        assert keep[row_p.argmax()]                      # argmax always kept
        # kept mass reaches p; dropping the least-likely kept token would not
        kept_sorted = np.sort(row_p[keep])
        assert row_p[keep].sum() >= 0.5
        assert row_p[keep].sum() - kept_sorted[0] < 0.5
    # p=1 keeps everything
    assert (np.asarray(sampling.apply_top_p(logits, 1.0)) == np.asarray(logits)).all()
    with pytest.raises(ValueError, match="top_p"):
        sampling.apply_top_p(logits, 0.0)


def test_sample_greedy_equals_argmax(rng):
    from ggml_experiments_tpu.ops import sampling

    logits = jnp.asarray(_rand(rng, 8, 66))
    ids = sampling.sample(logits, jax.random.PRNGKey(0), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(logits).argmax(-1))
    # top_k=1 sampling is argmax regardless of temperature
    ids1 = sampling.sample(logits, jax.random.PRNGKey(1), temperature=2.0, top_k=1)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(logits).argmax(-1))


def test_generate_with_topk_topp_runs():
    import os
    from ggml_experiments_tpu.formats.gru_bin import load_gru_params
    from ggml_experiments_tpu.models import gru_textgen

    params = load_gru_params(
        os.path.join(os.path.dirname(__file__), "goldens", "gru_small.bin")
    )
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    lengths = jnp.asarray([3], jnp.int32)
    toks = gru_textgen.generate(
        params, prompt, lengths, 20, temperature=0.9, top_k=10, top_p=0.9,
        rng=jax.random.PRNGKey(0),
    )
    assert toks.shape == (1, 20)
    assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < 66).all()
