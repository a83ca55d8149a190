"""Tests for the evaluation (quant-delta) and observability modules."""

import io
import json
import os

import numpy as np
import pytest

from ggml_experiments_tpu import evaluation
from ggml_experiments_tpu.formats.gru_bin import load_gru_params
from ggml_experiments_tpu.utils.observability import (
    MetricsLogger,
    TPU_V5E,
    gru_decode_roofline,
    qmatmul_roofline,
)

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def test_compare_logits_identity():
    a = np.random.default_rng(0).standard_normal((4, 10, 66)).astype(np.float32)
    rep = evaluation.compare_logits(a, a)
    assert rep.max_abs == 0 and rep.top1_agreement == 1.0 and rep.rel_rmse == 0


def test_compare_logits_shape_mismatch():
    with pytest.raises(ValueError, match="shape mismatch"):
        evaluation.compare_logits(np.zeros((2, 3)), np.zeros((2, 4)))


def test_perplexity_uniform():
    v = 66
    logits = np.zeros((2, 5, v), np.float32)
    targets = np.zeros((2, 5), np.int64)
    assert abs(evaluation.perplexity(logits, targets) - v) < 1e-3


def test_eval_gru_delta_quantized():
    ref = load_gru_params(os.path.join(GOLD, "gru_small.bin"))
    q8 = load_gru_params(os.path.join(GOLD, "gru_small.bin"), qtype="q8_0")
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 66, (4, 21)).astype(np.int32)
    rep = evaluation.eval_gru_delta(ref, q8, seqs)
    assert rep.top1_agreement > 0.95          # Δtop-1 within contract for q8
    assert rep.rel_rmse < 0.02
    assert abs(rep.ppl_a - rep.ppl_b) / rep.ppl_b < 0.02
    d = rep.as_dict()
    assert {"max_abs", "mean_abs", "rel_rmse", "top1_agreement"} <= set(d)


def test_qmatmul_roofline_math():
    # memory-bound regime: decode-like m=1
    r = qmatmul_roofline(1, 1024, 3072, seconds=1e-5)
    assert r.bound() == "memory"
    assert 0 < r.speed_of_light_fraction() < 1.5
    # compute-bound regime: big m
    r2 = qmatmul_roofline(4096, 1024, 3072, seconds=1e-3)
    assert r2.bound() == "compute"


def test_gru_decode_roofline():
    r = gru_decode_roofline(1024, 256, 1024, 66, seconds_per_step=80e-6)
    assert r.chip is TPU_V5E
    d = r.as_dict()
    assert d["bound"] in ("compute", "memory")
    assert d["achieved_tflops"] > 0


def test_metrics_logger_stream():
    buf = io.StringIO()
    m = MetricsLogger(buf)
    m.log("decode", tokens_per_s=123.0, batch=8)
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "decode" and rec["tokens_per_s"] == 123.0 and "t" in rec


def test_trace_report_parses_device_events(tmp_path):
    """trace_and_report traces a jitted fn and aggregates per-op rows (CPU
    traces label the device stream differently from TPU — the parser must
    degrade gracefully)."""
    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.utils.trace_report import (
        format_report, parse_trace, trace_and_report,
    )

    f = jax.jit(lambda a: jnp.tanh(a @ a).sum())
    x = jnp.ones((128, 128))
    rows = trace_and_report(f, x, reps=3, logdir=str(tmp_path))
    assert rows, "no events parsed from the trace"
    assert all(r.total_us >= r.per_call_us > 0 for r in rows[:1])
    # parse_trace re-reads the same logdir deterministically
    again = parse_trace(str(tmp_path), reps=3)
    assert [r.name for r in again] == [r.name for r in rows]
    table = format_report(rows, top=5)
    assert "us/call" in table and rows[0].name[:20] in table
