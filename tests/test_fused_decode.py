"""Persistent fused decode kernel vs the composable scan decoder (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu import quant
from ggml_experiments_tpu.formats.gru_bin import load_gru_params
from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.models.gru_textgen import GRUConfig
from ggml_experiments_tpu.ops.fused_gru_decode import fused_gru_decode

import os

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def qparams():
    return load_gru_params(os.path.join(GOLD, "gru_small.bin"), qtype="q8_0")


def test_fused_matches_scan_decode(qparams):
    gold = np.load(os.path.join(GOLD, "gru_small.npz"))
    prompt = jnp.asarray(gold["prompt"][None, :].astype(np.int32))
    lengths = jnp.asarray(np.array([len(gold["prompt"])], np.int32))
    want = np.asarray(gru_textgen.generate(qparams, prompt, lengths, 60))
    got = np.asarray(
        fused_gru_decode(qparams, prompt, lengths, 60, compute_dtype=jnp.float32)
    )
    np.testing.assert_array_equal(got, want)


def test_fused_batched_ragged_prompts(qparams):
    rng = np.random.default_rng(3)
    b = 5
    prompts = np.zeros((b, 9), np.int32)
    lengths = np.zeros((b,), np.int32)
    for i in range(b):
        n = int(rng.integers(1, 10))
        prompts[i, :n] = rng.integers(0, 66, n)
        lengths[i] = n
    want = np.asarray(
        gru_textgen.generate(qparams, jnp.asarray(prompts), jnp.asarray(lengths), 40)
    )
    got = np.asarray(
        fused_gru_decode(
            qparams, jnp.asarray(prompts), jnp.asarray(lengths), 40,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_fused_requires_quantized():
    p = load_gru_params(os.path.join(GOLD, "gru_small.bin"))  # fp32
    with pytest.raises(ValueError, match="q8_0"):
        fused_gru_decode(p, jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32), 8)


def test_decode_facade_routes(qparams, monkeypatch):
    """decode() picks the fused kernel only for greedy+q8 at B>=2048/T>=256
    (thresholds re-derived round 3 from tools/diag_decode_dispatch.py: the
    fused kernel wins 1.5-1.7x at B=2048 but is a high-variance tie at
    B=1024 and 3.2x slower at B=512/T=128)."""
    prompt = jnp.zeros((2, 3), jnp.int32)
    lengths = jnp.full((2,), 3, jnp.int32)
    # small batch -> generate path (just verify it runs + matches generate)
    a = gru_textgen.decode(qparams, prompt, lengths, 10, compute_dtype=jnp.float32)
    b = gru_textgen.generate(qparams, prompt, lengths, 10, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # routing decisions, checked without paying the big interpret-mode runs
    # (the ops package re-exports the function under the submodule's name,
    # so fetch the module object itself for patching)
    import importlib

    fd = importlib.import_module("ggml_experiments_tpu.ops.fused_gru_decode")

    calls = []
    monkeypatch.setattr(
        fd, "fused_gru_decode",
        lambda *a, **k: calls.append(a[1].shape) or a[1],
    )
    for batch, steps, want_fused in (
        (512, 128, False),    # old threshold: measured 3.2x scan's time
        (1024, 256, False),   # high-variance tie: stay on the stable scan
        (2048, 256, True),
        (2048, 512, True),
        (3584, 512, True),    # past the untiled boundary: tiled fused
        (4096, 512, True),    # batch-tiled fused (measured 25.05M tok/s at
                              # B=8192/T=512 vs the scan's falling 11.2M
                              # at B=4096)
    ):
        calls.clear()
        p = jnp.zeros((batch, 3), jnp.int32)
        l = jnp.full((batch,), 3, jnp.int32)
        gru_textgen.decode(qparams, p, l, steps)
        assert bool(calls) == want_fused, (batch, steps, calls)


def test_dispatch_thresholds_recalibration_file(qparams, monkeypatch, tmp_path):
    """decode() routing thresholds come from the on-machine calibration file
    when present (tools/recalibrate_decode.py — the VERDICT r4 #3 self-heal
    for platform drift); a corrupt file falls back to the defaults."""
    import json

    from ggml_experiments_tpu.models import gru_textgen as g

    cal = tmp_path / "dispatch.json"
    monkeypatch.setenv("GXT_DECODE_DISPATCH", str(cal))

    # no file: measured defaults
    thr = g.dispatch_thresholds(reload=True)
    assert (thr["min_b"], thr["min_t"], thr["source"]) == (2048, 256, "default")

    cal.write_text(json.dumps({"min_b": 4, "min_t": 8, "evidence": {}}))
    thr = g.dispatch_thresholds(reload=True)
    assert thr["min_b"] == 4 and thr["min_t"] == 8 and thr["source"] == str(cal)

    # with the tiny thresholds a B=4 decode routes through the fused kernel
    called = {}
    import importlib

    # ops/__init__ re-exports a function named like the submodule; fetch the
    # real module object to patch its attribute
    fgd = importlib.import_module("ggml_experiments_tpu.ops.fused_gru_decode")
    real = fgd.fused_gru_decode

    def spy(*a, **kw):
        called["fused"] = True
        return real(*a, **kw)

    monkeypatch.setattr(fgd, "fused_gru_decode", spy)
    prompt = jnp.zeros((4, 4), jnp.int32)
    g.decode(qparams, prompt, jnp.full((4,), 2, jnp.int32), 8)
    assert called.get("fused")

    # corrupt file: defaults, source says why
    cal.write_text("{not json")
    thr = g.dispatch_thresholds(reload=True)
    assert thr["min_b"] == 2048 and "unreadable" in thr["source"]
    g.dispatch_thresholds(reload=True)  # leave the cache clean for others
    monkeypatch.delenv("GXT_DECODE_DISPATCH")
    g._dispatch_cache = None


def test_fused_q4_matches_scan(rng):
    """Q4_0 weights run the persistent kernel too (nibbles unpacked during
    VMEM setup); tokens match the scan decode exactly at matched dtype."""
    cfg = GRUConfig(vocab_size=66, embed_dim=32, units=64)
    fp = gru_textgen.init_params(cfg, jax.random.PRNGKey(11))
    q4 = gru_textgen.GRUTextGenParams(
        embeddings=fp.embeddings,
        cell=type(fp.cell)(
            kernel=quant.quantize(np.asarray(fp.cell.kernel), "q4_0"),
            recurrent_kernel=quant.quantize(np.asarray(fp.cell.recurrent_kernel), "q4_0"),
            bias=fp.cell.bias,
        ),
        dense_kernel=quant.quantize(np.asarray(fp.dense_kernel), "q4_0"),
        dense_bias=fp.dense_bias,
    )
    prompt = jnp.asarray(rng.integers(0, 66, (4, 5)), jnp.int32)
    lengths = jnp.full((4,), 5, jnp.int32)
    a = np.asarray(fused_gru_decode(q4, prompt, lengths, 40, compute_dtype=jnp.float32))
    b = np.asarray(gru_textgen.generate(q4, prompt, lengths, 40, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def _requantized(qtypes, seed=12):
    """Params with (kernel, recurrent, dense) quantized at the given qtypes."""
    cfg = GRUConfig(vocab_size=66, embed_dim=32, units=64)
    fp = gru_textgen.init_params(cfg, jax.random.PRNGKey(seed))
    return gru_textgen.GRUTextGenParams(
        embeddings=fp.embeddings,
        cell=type(fp.cell)(
            kernel=quant.quantize(np.asarray(fp.cell.kernel), qtypes[0]),
            recurrent_kernel=quant.quantize(
                np.asarray(fp.cell.recurrent_kernel), qtypes[1]),
            bias=fp.cell.bias,
        ),
        dense_kernel=quant.quantize(np.asarray(fp.dense_kernel), qtypes[2]),
        dense_bias=fp.dense_bias,
    )


@pytest.mark.parametrize("qtypes", [
    ("q8_0", "q4_0", "q8_0"),   # mixed -> dense-plane path
    ("q4_1", "q4_1", "q4_1"),
    ("q5_0", "q5_0", "q5_0"),
    ("q5_1", "q5_1", "q5_1"),
])
def test_fused_dense_path_matches_scan(qtypes):
    """q4_1/q5_0/q5_1 and mixed-qtype params ride the kernel's dense-plane
    path (in-graph dequant feeds pre-dequantized f32 planes): token-exact vs
    the scan decode at matched dtype."""
    from ggml_experiments_tpu.ops.fused_gru_decode import _check_quantized

    p = _requantized(qtypes)
    assert _check_quantized(p) == "dense"
    rng = np.random.default_rng(5)
    prompts = jnp.asarray(rng.integers(0, 66, (4, 5)), jnp.int32)
    lengths = jnp.full((4,), 5, jnp.int32)
    a = np.asarray(fused_gru_decode(p, prompts, lengths, 40,
                                    compute_dtype=jnp.float32))
    b = np.asarray(gru_textgen.generate(p, prompts, lengths, 40,
                                        compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_fused_dense_path_batch_tiled():
    """The dense-plane path composes with batch tiling."""
    p = _requantized(("q5_1", "q5_1", "q5_1"), seed=13)
    rng = np.random.default_rng(6)
    prompts = jnp.asarray(rng.integers(0, 66, (256, 4)), jnp.int32)
    lengths = jnp.full((256,), 4, jnp.int32)
    un = np.asarray(fused_gru_decode(p, prompts, lengths, 16,
                                     compute_dtype=jnp.float32, batch_tile=0))
    ti = np.asarray(fused_gru_decode(p, prompts, lengths, 16,
                                     compute_dtype=jnp.float32, batch_tile=128))
    np.testing.assert_array_equal(ti, un)


def test_fused_slot_tick_matches_scan_tick():
    """fused_slot_tick == _slot_scan token-for-token across resumed ticks,
    mixed prompt lengths, mid-tick completions and idle slots."""
    import dataclasses

    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.quant import quantize
    from ggml_experiments_tpu.serving.engine import _slot_scan, init_state

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=64)
    fp = gru_textgen.init_params(cfg, jax.random.PRNGKey(3))
    params = gru_textgen.GRUTextGenParams(
        embeddings=fp.embeddings,
        cell=dataclasses.replace(
            fp.cell,
            kernel=quantize(np.asarray(fp.cell.kernel), "q8_0"),
            recurrent_kernel=quantize(np.asarray(fp.cell.recurrent_kernel), "q8_0"),
        ),
        dense_kernel=quantize(np.asarray(fp.dense_kernel), "q8_0"),
        dense_bias=fp.dense_bias,
    )

    n_slots, max_prompt, inner = 8, 8, 16
    state = init_state(params, n_slots, max_prompt)
    rng = np.random.default_rng(0)
    # slots 0..5 live with varying prompts/totals (slot 3 finishes mid-tick-1,
    # slot 5 runs out exactly at a tick boundary); 6..7 idle
    plen = np.array([1, 3, 8, 2, 5, 4, 0, 0], np.int32)
    total = np.array([40, 25, 33, 10, 16, 32, 0, 0], np.int32)
    prompt = np.zeros((n_slots, max_prompt), np.int32)
    for i in range(n_slots):
        prompt[i, : plen[i]] = rng.integers(1, 66, plen[i])
    state = dataclasses.replace(
        state,
        prompt=jnp.asarray(prompt),
        plen=jnp.asarray(plen),
        total=jnp.asarray(total),
    )
    s_scan = state
    s_fused = state
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    for tick in range(3):
        s_scan, toks_a, valid = scan(
            params, s_scan, np.int32(tick), inner, compute_dtype=jnp.float32
        )
        s_fused, toks_b = fused_slot_tick(
            params, s_fused, inner, compute_dtype=jnp.float32
        )
        va = np.asarray(valid)
        ta = np.asarray(toks_a)
        tb = np.asarray(toks_b)
        assert ta.dtype == tb.dtype == np.uint8
        np.testing.assert_array_equal(np.where(va, ta, 0), np.where(va, tb, 0),
                                      err_msg=f"tick {tick}")
        np.testing.assert_array_equal(np.asarray(s_scan.pos), np.asarray(s_fused.pos))
        np.testing.assert_array_equal(
            np.where(np.asarray(s_scan.pos) < total, np.asarray(s_scan.prev), 0),
            np.where(np.asarray(s_fused.pos) < total, np.asarray(s_fused.prev), 0),
        )
        np.testing.assert_allclose(
            np.asarray(s_scan.h), np.asarray(s_fused.h), atol=2e-5, rtol=2e-5
        )


TRAINED = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "gru_synth.bin")
HELDOUT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "corpus_heldout.txt")


@pytest.mark.skipif(not (os.path.exists(TRAINED) and os.path.exists(HELDOUT)),
                    reason="trained checkpoint not present")
def test_bf16_fused_vs_scan_parity_contract():
    """bf16 parity pinned as a CONTRACT (VERDICT r4 #2), on the production
    dtype every headline number is measured at.

    Metric: SINGLE-STEP token agreement from matched teacher-forced context
    (prompt length L, total L+1 — both paths see identical tokens and emit
    one free prediction). Full free-running sequences are the wrong metric:
    one near-tie flip legitimately forks the whole greedy suffix, so
    sequence agreement measures compounding, not the kernel. The state still
    drifts apart with L (the two implementations round bf16 differently per
    step), which is what the L sweep bounds.

    Measured on the trained checkpoint (B=256 held-out contexts):
    - real TPU: decode L=16 100.0%, L=48 99.61%; serving tick L=32 100.0%
    - CPU interpret (this CI): decode L=16 99.6%, L=48 98.8%
    f32 is token-exact on every path (tests above)."""
    import dataclasses

    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import _slot_scan, init_state
    from ggml_experiments_tpu.training.data import (
        DataConfig, load_corpus, make_examples,
    )
    from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

    p = load_gru_params(TRAINED, qtype="q8_0")
    ex = make_examples(load_corpus(HELDOUT), CharTokenizer(),
                       DataConfig(seq_length=100))
    b = 128
    for el, bound in ((16, 0.98), (48, 0.96)):
        prompt = jnp.asarray(ex[:b, :el].astype(np.int32))
        lengths = jnp.full((b,), el, jnp.int32)
        a = np.asarray(gru_textgen.generate(
            p, prompt, lengths, el + 1, compute_dtype=jnp.bfloat16))[:, -1]
        f = np.asarray(fused_gru_decode(
            p, prompt, lengths, el + 1, compute_dtype=jnp.bfloat16))[:, -1]
        agree = (a == f).mean()
        assert agree >= bound, (el, agree)

    # the serving tick, same contract (one tick covers prompt + 1 free step)
    el = 32
    state = init_state(p, b, el)
    state = dataclasses.replace(
        state,
        prompt=jnp.asarray(ex[:b, :el].astype(np.int32)),
        plen=jnp.full((b,), el, jnp.int32),
        total=jnp.full((b,), el + 1, jnp.int32),
    )
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    _, ta, _ = scan(p, state, np.int32(0), el + 8, compute_dtype=jnp.bfloat16)
    _, tb = fused_slot_tick(p, state, el + 8, compute_dtype=jnp.bfloat16)
    pred_a = np.asarray(ta)[:, el]  # toks (B, inner): the single free step
    pred_b = np.asarray(tb)[:, el]
    assert (pred_a == pred_b).mean() >= 0.96, (pred_a == pred_b).mean()


def test_fused_slot_tick_tiled_matches_untiled():
    """slot_tile > 0 (grid over slot tiles, persistent weight scratch) is
    token- and state-exact vs the untiled kernel and the scan tick."""
    import dataclasses

    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.quant import quantize
    from ggml_experiments_tpu.serving.engine import _slot_scan, init_state

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=64)
    fp = gru_textgen.init_params(cfg, jax.random.PRNGKey(4))
    params = gru_textgen.GRUTextGenParams(
        embeddings=fp.embeddings,
        cell=dataclasses.replace(
            fp.cell,
            kernel=quantize(np.asarray(fp.cell.kernel), "q8_0"),
            recurrent_kernel=quantize(np.asarray(fp.cell.recurrent_kernel), "q8_0"),
        ),
        dense_kernel=quantize(np.asarray(fp.dense_kernel), "q8_0"),
        dense_bias=fp.dense_bias,
    )
    n_slots, inner = 8, 16   # padded slot dim 128; tile 64 -> 2 grid steps
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 66, (n_slots, 8))
    plen = rng.integers(1, 8, n_slots)

    def fresh_state():   # the tick jits donate their state argument
        return dataclasses.replace(
            init_state(params, n_slots, max_prompt=8),
            prompt=jnp.asarray(prompt, jnp.int32),
            plen=jnp.asarray(plen, jnp.int32),
            total=jnp.full((n_slots,), 40, jnp.int32),
        )

    s_un, s_ti, s_sc = fresh_state(), fresh_state(), fresh_state()
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    for tick in range(2):
        s_un, toks_un = fused_slot_tick(params, s_un, inner,
                                        compute_dtype=jnp.float32, slot_tile=0)
        s_ti, toks_ti = fused_slot_tick(params, s_ti, inner,
                                        compute_dtype=jnp.float32, slot_tile=64)
        s_sc, toks_sc, _v = scan(params, s_sc, np.int32(tick), inner,
                                 compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(toks_ti), np.asarray(toks_un),
                                      err_msg=f"tick {tick}")
        np.testing.assert_array_equal(np.asarray(toks_ti), np.asarray(toks_sc))
        np.testing.assert_array_equal(np.asarray(s_ti.pos), np.asarray(s_un.pos))
        np.testing.assert_allclose(np.asarray(s_ti.h), np.asarray(s_un.h),
                                   atol=1e-6, rtol=1e-6)


def test_auto_slot_tile_policy():
    from ggml_experiments_tpu.ops.fused_gru_decode import (
        FUSED_TICK_MAX_UNTILED, TICK_SLOT_TILE, _auto_slot_tile,
    )

    for qt, limit in FUSED_TICK_MAX_UNTILED.items():
        assert _auto_slot_tile(limit, qt) == 0          # at the boundary: untiled
        assert _auto_slot_tile(128, qt) == 0
        t = _auto_slot_tile(8192, qt)                   # past it: widest safe tile
        assert t == TICK_SLOT_TILE and 8192 % t == 0
        # the LARGEST boundary-safe 128-multiple divisor is picked (3840 ->
        # 1920, not a narrow power of two)
        t2 = _auto_slot_tile(3840, qt)
        assert t2 == 1920 and 3840 % t2 == 0 and t2 <= limit
        # long ticks fall back to the always-safe 2048 boundary, so 3072
        # tiles at its largest divisor under 2048
        assert _auto_slot_tile(3072, qt, inner_steps=512) == 1536


def test_fused_decode_batch_tiled_matches_untiled(qparams):
    """batch_tile > 0 (sequential grid over batch tiles with the dequantized
    weight scratch persisting across grid steps — the offline twin of the
    tiled serving tick) decodes token-exactly vs the untiled kernel and the
    scan path."""
    rng = np.random.default_rng(7)
    b = 256
    prompts = np.zeros((b, 6), np.int32)
    lengths = np.zeros((b,), np.int32)
    for i in range(b):
        n = int(rng.integers(1, 7))
        prompts[i, :n] = rng.integers(0, 66, n)
        lengths[i] = n
    p, l = jnp.asarray(prompts), jnp.asarray(lengths)
    un = np.asarray(fused_gru_decode(qparams, p, l, 24,
                                     compute_dtype=jnp.float32, batch_tile=0))
    ti = np.asarray(fused_gru_decode(qparams, p, l, 24,
                                     compute_dtype=jnp.float32, batch_tile=128))
    sc = np.asarray(gru_textgen.generate(qparams, p, l, 24,
                                         compute_dtype=jnp.float32))
    np.testing.assert_array_equal(ti, un)
    np.testing.assert_array_equal(ti, sc)


def test_auto_decode_tile_policy():
    from ggml_experiments_tpu.ops.fused_gru_decode import (
        FUSED_DECODE_MAX_UNTILED, _auto_tile,
    )

    for qt, limit in FUSED_DECODE_MAX_UNTILED.items():
        assert _auto_tile(limit, limit) == 0      # at the boundary: untiled
        assert _auto_tile(128, limit) == 0
        t = _auto_tile(8192, limit)               # past it: widest safe tile
        assert t == 2048 and 8192 % t == 0
        t2 = _auto_tile(3840, limit)              # largest 128-multiple divisor
        assert t2 == 1920 and 3840 % t2 == 0 and t2 <= limit


def test_decode_tile_limit_scales_with_T():
    from ggml_experiments_tpu.ops.fused_gru_decode import _decode_tile_limit

    assert _decode_tile_limit("q8_0", 512) == 2048     # the measured point
    assert _decode_tile_limit("q8_0", 256) == 2048     # capped at the base
    long = _decode_tile_limit("q8_0", 4096)            # long decodes shrink
    assert 128 <= long < 2048
    assert _decode_tile_limit("q8_0", 10**6) == 128    # floor


def test_fused_slot_tick_dense_path_matches_scan_tick():
    """The serving tick accepts q5_1 (dense-plane) params: token-exact vs
    the scan tick across resumed ticks."""
    import dataclasses

    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import _slot_scan, init_state

    params = _requantized(("q5_1", "q5_1", "q5_1"), seed=21)
    n_slots, max_prompt, inner = 8, 8, 16
    rng = np.random.default_rng(9)
    prompt = np.zeros((n_slots, max_prompt), np.int32)
    plen = np.zeros((n_slots,), np.int32)
    for i in range(n_slots):
        n = int(rng.integers(1, max_prompt))
        prompt[i, :n] = rng.integers(0, 66, n)
        plen[i] = n

    def fresh_state():
        return dataclasses.replace(
            init_state(params, n_slots, max_prompt),
            prompt=jnp.asarray(prompt, jnp.int32),
            plen=jnp.asarray(plen, jnp.int32),
            total=jnp.full((n_slots,), 40, jnp.int32),
        )

    s_f, s_s = fresh_state(), fresh_state()
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    for tick in range(2):
        s_f, toks_f = fused_slot_tick(params, s_f, inner,
                                      compute_dtype=jnp.float32)
        s_s, toks_s, _v = scan(params, s_s, np.int32(tick), inner,
                               compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_s),
                                      err_msg=f"tick {tick}")
        np.testing.assert_allclose(np.asarray(s_f.h), np.asarray(s_s.h),
                                   atol=1e-5, rtol=1e-5)


def _sampled_state(params, n_slots, max_prompt=8, greedy_head=2, temp=0.9):
    """Identical prompt/total on every slot (the decorrelation worst case);
    the first ``greedy_head`` slots run temp=0 (exactness anchors)."""
    import dataclasses

    from ggml_experiments_tpu.serving.engine import init_state

    prompt = np.zeros((n_slots, max_prompt), np.int32)
    prompt[:, :2] = [5, 9]
    temps = np.full(n_slots, temp, np.float32)
    temps[:greedy_head] = 0.0
    return dataclasses.replace(
        init_state(params, n_slots, max_prompt),
        prompt=jnp.asarray(prompt),
        plen=jnp.full((n_slots,), 2, jnp.int32),
        total=jnp.full((n_slots,), 34, jnp.int32),
        temp=jnp.asarray(temps),
    )


def test_fused_tick_sampling_interpret():
    """The sampled fused tick runs under the Pallas interpreter (hash-lattice
    PRNG fallback — pltpu.prng_* has no interpret lowering): temp=0 slots
    stay token-exact vs the scan tick, sampled slots draw valid,
    deterministic, per-slot-decorrelated tokens."""
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import _slot_scan

    params = _requantized(("q8_0", "q8_0", "q8_0"), seed=17)
    inner = 16
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    s = _sampled_state(params, 8)
    _, toks_scan, _v = scan(params, s, np.int32(0), inner,
                            compute_dtype=jnp.float32)
    sc = np.asarray(toks_scan)

    def run(**kw):
        st = jax.tree.map(jnp.array, _sampled_state(params, 8))
        _, toks = fused_slot_tick(params, st, inner, compute_dtype=jnp.float32,
                                  enable_sampling=True, seed=7, **kw)
        return np.asarray(toks)

    a = run()
    np.testing.assert_array_equal(a, run())          # (config, seed) replays
    np.testing.assert_array_equal(a[:2], sc[:2])     # greedy slots exact
    assert a.max() < 66                              # valid token range
    sampled = a[2:]
    assert not all(np.array_equal(sampled[0], sampled[i]) for i in range(1, 6))


def _free_step_samples(params, n_slots, inner=3, **kw):
    """One tick over identically-primed slots; returns each slot's FIRST
    free token (steps 0-1 feed the 2-token prompt) — n_slots independent
    draws from the same per-step distribution."""
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick

    st = jax.tree.map(jnp.array, _sampled_state(params, n_slots, greedy_head=0,
                                                temp=1.0))
    _, toks = fused_slot_tick(params, st, inner, compute_dtype=jnp.float32,
                              enable_sampling=True, seed=11, **kw)
    return np.asarray(toks)[:, 2]  # toks (B, inner): step-2 token per slot


def _exact_filtered_probs(params, top_k=None, top_p=None):
    """The scan-path reference distribution for the first free token."""
    from ggml_experiments_tpu.ops import sampling

    h = gru_textgen.init_state(params, 1)
    for t in (5, 9):
        logits, h = gru_textgen.step(params, jnp.full((1,), t, jnp.int32), h)
    x = logits / 1.0
    if top_k is not None:
        x = sampling.apply_top_k(x, top_k)
    if top_p is not None:
        x = sampling.apply_top_p(x, top_p)
    return np.asarray(jax.nn.softmax(x, axis=-1))[0]


def test_fused_tick_topk_topp_in_kernel():
    """VERDICT r4 #6: top-k/top-p filtering rides the fused tick. Hard
    support checks (ZERO mass outside the reference filter set, computed by
    the scan path's sampling ops) + a TV-distance bound on the empirical
    distribution, + top_k=1 == greedy exactness."""
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import _slot_scan

    params = _requantized(("q8_0", "q8_0", "q8_0"), seed=17)

    # top_k=1 at any temperature must equal greedy argmax, token for token
    st = jax.tree.map(jnp.array, _sampled_state(params, 8, greedy_head=0))
    _, toks_k1 = fused_slot_tick(params, st, 16, compute_dtype=jnp.float32,
                                 enable_sampling=True, seed=7, top_k=1)
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    _, toks_greedy, _ = scan(
        params, _sampled_state(params, 8, greedy_head=8), np.int32(0), 16,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(toks_k1), np.asarray(toks_greedy))

    n = 512
    for kw in ({"top_k": 5}, {"top_p": 0.6}, {"top_k": 8, "top_p": 0.85}):
        ref = _exact_filtered_probs(params, **kw)
        support = np.flatnonzero(ref > 0)
        draws = _free_step_samples(params, n, **kw)
        counts = np.bincount(draws, minlength=len(ref))
        outside = counts.sum() - counts[support].sum()
        assert outside == 0, (kw, np.flatnonzero(counts), support)
        emp = counts / n
        tv = 0.5 * np.abs(emp - ref).sum()
        # n=512 multinomial noise floor for these supports is ~0.05-0.08
        assert tv < 0.15, (kw, tv)

    # filtered ticks replay deterministically and survive slot tiling
    a = _free_step_samples(params, 128, top_k=4)
    b = _free_step_samples(params, 128, top_k=4)
    np.testing.assert_array_equal(a, b)
    t = _free_step_samples(params, 128, top_k=4, slot_tile=64)
    ref4 = _exact_filtered_probs(params, top_k=4)
    assert np.isin(t, np.flatnonzero(ref4 > 0)).all()


def test_engine_filtered_sampling_routes_fused():
    """A sampled engine with top_k/top_p no longer refuses the fused tick."""
    from ggml_experiments_tpu.serving import DecodeEngine

    params = _requantized(("q8_0", "q8_0", "q8_0"), seed=17)
    eng = DecodeEngine(params, n_slots=8, max_prompt=8, inner_steps=8,
                       temperature=0.8, top_k=5, top_p=0.9,
                       use_fused_tick=True)
    eng.start()
    try:
        req = eng.submit([5, 9], 12)
        toks = req.result(timeout=120)
        # result = prompt echo + 12 new tokens, all in-vocab
        assert len(toks) == 14 and max(toks) < 66
    finally:
        eng.stop()
    assert eng.error is None


def test_fused_tick_sampling_decorrelates_tiles_and_shards():
    """Per-block PRNG seeds mix the block's first global slot index: slot
    tiles of the sequential grid and shards of a slot-partitioned tick draw
    distinct sample streams even from identical slot state (the round-3
    reason sampled multi-process serving was forced onto the scan tick)."""
    from jax.sharding import Mesh

    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import _slot_scan

    params = _requantized(("q8_0", "q8_0", "q8_0"), seed=17)
    inner = 16

    def run(**kw):
        st = jax.tree.map(jnp.array, _sampled_state(params, 128, greedy_head=1))
        _, toks = fused_slot_tick(params, st, inner, compute_dtype=jnp.float32,
                                  enable_sampling=True, seed=7, **kw)
        return np.asarray(toks)

    tiled = run(slot_tile=64)
    assert tiled.max() < 66
    # slots 1 and 65 carry identical state in different tiles
    assert not np.array_equal(tiled[1], tiled[65]), "tile streams correlated"

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    sh = run(mesh=mesh, slot_axis="data")
    np.testing.assert_array_equal(sh, run(mesh=mesh, slot_axis="data"))
    assert sh.max() < 66
    # 128 padded slots over 8 shards: slots 1, 17, 33 sit in distinct shards
    assert not np.array_equal(sh[1], sh[17]), "shard streams correlated"
    assert not np.array_equal(sh[17], sh[33]), "shard streams correlated"
    # greedy slot 0 stays exact under sharding
    scan = jax.jit(_slot_scan, static_argnames=("inner_steps", "compute_dtype"))
    _, toks_scan, _v = scan(params, _sampled_state(params, 128, greedy_head=1),
                            np.int32(0), inner, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(sh[0], np.asarray(toks_scan)[0])
