"""Unit tests for GPTQ error compensation + calibration statistics.

The model-level acceptance lives in tests/test_trained_model.py
(test_q4_k_m_gptq_closes_4bit_contract); these pin the mechanics on
synthetic data: the compensated rounding must beat RTN on LAYER-OUTPUT
error under the calibration distribution (the quantity GPTQ optimizes),
and the statistics collectors must match hand-computed moments.
"""

import numpy as np
import pytest

from ggml_experiments_tpu.quant import gptq


def _layer_mse(x, w, qt):
    from ggml_experiments_tpu.quant.qtensor import dequantize

    err = x @ (np.asarray(dequantize(qt)) - w)
    return float(np.mean(err**2))


@pytest.mark.parametrize("k,n", [(256, 384), (512, 128)])
def test_gptq_q4_k_beats_rtn_on_layer_output(rng, k, n):
    from ggml_experiments_tpu.quant.qtensor import quantize

    # correlated inputs (the regime where compensation matters)
    basis = rng.standard_normal((k, k // 4)).astype(np.float64)
    x = rng.standard_normal((2048, k // 4)) @ basis.T
    x += 0.1 * rng.standard_normal(x.shape)
    h = x.T @ x / x.shape[0]
    w = rng.standard_normal((k, n)) * 0.1

    qt_gptq = gptq.gptq_quantize_q4_k(w, h)
    qt_rtn = quantize(w.astype(np.float32), "q4_k")
    mse_gptq = _layer_mse(x, w, qt_gptq)
    mse_rtn = _layer_mse(x, w, qt_rtn)
    assert mse_gptq < mse_rtn * 0.9, (mse_gptq, mse_rtn)
    assert qt_gptq.qtype == "q4_k" and qt_gptq.shape == (k, n)
    assert qt_gptq.bits_per_weight < 5.0


def test_gptq_q8_0_beats_rtn_on_layer_output(rng):
    from ggml_experiments_tpu.quant.qtensor import quantize

    k, n = 256, 130
    basis = rng.standard_normal((k, 32)).astype(np.float64)
    x = rng.standard_normal((4096, 32)) @ basis.T + 0.05 * rng.standard_normal((4096, k))
    h = x.T @ x / x.shape[0]
    w = rng.standard_normal((k, n)) * 0.1
    qt = gptq.gptq_quantize_q8_0(w, h)
    assert qt.qtype == "q8_0" and qt.shape == (k, n)
    assert _layer_mse(x, w, qt) < _layer_mse(x, w, quantize(w.astype(np.float32), "q8_0"))


def test_gptq_identity_hessian_equals_blockwise_rtn_error_class(rng):
    """With H = I there is nothing to compensate across rows; GPTQ must not
    be (meaningfully) worse than plain q4_k on element MSE."""
    from ggml_experiments_tpu.quant.qtensor import dequantize, quantize

    w = rng.standard_normal((256, 128)) * 0.1
    qt = gptq.gptq_quantize_q4_k(w, np.eye(256))
    qt0 = quantize(w.astype(np.float32), "q4_k")
    e = float(np.mean((np.asarray(dequantize(qt)) - w) ** 2))
    e0 = float(np.mean((np.asarray(dequantize(qt0)) - w) ** 2))
    assert e <= e0 * 1.2, (e, e0)


def test_gptq_shape_validation(rng):
    with pytest.raises(ValueError):
        gptq.gptq_quantize_q4_k(rng.standard_normal((64, 32)), np.eye(32))


def test_collect_gru_moments_and_hessians_consistent(rng):
    """diag(H) must equal the moment vector for the same tap (both are
    E[x^2] statistics of identical activations)."""
    import jax

    from ggml_experiments_tpu.models.gru_textgen import GRUConfig, init_params
    from ggml_experiments_tpu.quant import calibration

    params = init_params(GRUConfig(vocab_size=20, embed_dim=16, units=32),
                         jax.random.PRNGKey(0))
    seqs = rng.integers(0, 20, (4, 33)).astype(np.int32)
    mom = calibration.collect_gru_moments(params, seqs)
    hes = calibration.collect_gru_hessians(params, seqs)
    for key in ("kernel", "recurrent_kernel", "dense_kernel"):
        np.testing.assert_allclose(np.diagonal(hes[key]), mom[key],
                                   rtol=1e-6, atol=1e-9)
        # Gram matrices are PSD
        ev = np.linalg.eigvalsh(hes[key])
        assert ev.min() > -1e-8


def test_mobilevit_gram_taps_and_gptq(rng):
    """The call-order Gram collector must produce one PSD (K, K) matrix per
    quantizable vision weight, and the GPTQ'd params must stay close to the
    float model on random inputs."""
    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, classify, from_named_tensors, random_named_tensors,
    )
    from ggml_experiments_tpu.quant import calibration
    from ggml_experiments_tpu.quant.qtensor import QTensor

    cfg = MobileViTConfig(
        image_size=64, hidden_sizes=(32, 48, 64), num_transformer_layers=(1, 1, 1),
        neck_hidden_sizes=(8, 16, 24, 32, 48, 64, 96), num_labels=10,
    )
    named = random_named_tensors(cfg, seed=0, classifier=True)
    pf = from_named_tensors(named, cfg, qtype=None, flash_attn=False,
                            fused_layer=False)
    x = rng.random((8, 64, 64, 3)).astype(np.float32)
    grams = calibration.collect_mobilevit_grams(pf, x, batch=4)
    assert len(grams) == 3 * 6 + 1  # 1 layer/block x 6 weights + classifier
    for name, h in grams.items():
        assert h.shape[0] == h.shape[1]
        # PSD up to f32 accumulation noise, relative to the matrix scale
        tol = 1e-6 * max(1.0, float(np.trace(h)) / h.shape[0])
        assert np.linalg.eigvalsh(h).min() > -tol, name

    pq = from_named_tensors(named, cfg, qtype=None, flash_attn=False,
                            fused_layer=False)
    pq = calibration.gptq_mobilevit_params(pq, grams)
    assert isinstance(pq.layer_3.transformer[0].attention.wq, QTensor)
    assert pq.layer_3.transformer[0].attention.wq.qtype == "q4_k"
    assert pq.classifier_kernel.qtype == "q8_0"
    la = np.asarray(jax.jit(classify)(pf, jnp.asarray(x)))
    lb = np.asarray(jax.jit(classify)(pq, jnp.asarray(x)))
    rel = np.sqrt(np.mean((lb - la) ** 2)) / np.sqrt(np.mean(la ** 2))
    assert rel < 0.05, rel


def test_gptq_gru_params_structure(rng):
    import jax

    from ggml_experiments_tpu.models.gru_textgen import GRUConfig, init_params
    from ggml_experiments_tpu.quant import calibration

    params = init_params(GRUConfig(vocab_size=20, embed_dim=32, units=64),
                         jax.random.PRNGKey(1))
    seqs = rng.integers(0, 20, (4, 33)).astype(np.int32)
    p = calibration.gptq_gru_params(params, seqs)
    assert p.cell.kernel.qtype == "q4_k"
    assert p.cell.recurrent_kernel.qtype == "q4_k"
    assert p.dense_kernel.qtype == "q8_0"
    # mixed-qtype params still route the fused decode dense path
    from ggml_experiments_tpu.ops.fused_gru_decode import is_fusable_params

    assert is_fusable_params(p)
