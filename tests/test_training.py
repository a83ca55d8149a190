"""Training-loop tests: loss decreases, checkpointing, data pipeline."""

import jax
import numpy as np
import pytest

from ggml_experiments_tpu.formats.checkpoint import load_into
from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.models.gru_textgen import GRUConfig
from ggml_experiments_tpu.training import TrainConfig, train, train_from_text
from ggml_experiments_tpu.training.data import DataConfig, batches, make_examples, synthetic_corpus
from ggml_experiments_tpu.utils.tokenizer import CharTokenizer


SMALL = GRUConfig(vocab_size=66, embed_dim=16, units=32)
DATA = DataConfig(seq_length=24, batch_size=8)


def _examples():
    tok = CharTokenizer()
    return make_examples(synthetic_corpus(8000), tok, DATA)


def test_data_pipeline_shapes():
    ex = _examples()
    assert ex.shape[1] == 25
    got = list(batches(ex, DATA, epochs=1))
    assert all(i.shape == (8, 24) and t.shape == (8, 24) for i, t in got)
    i0, t0 = got[0]
    np.testing.assert_array_equal(i0[:, 1:], t0[:, :-1])  # shift-by-one targets


def test_batches_shuffle_differs_by_seed():
    ex = _examples()
    a = next(iter(batches(ex, DATA, seed=1)))[0]
    b = next(iter(batches(ex, DATA, seed=2)))[0]
    assert not np.array_equal(a, b)


def test_training_reduces_loss(tmp_path):
    params = gru_textgen.init_params(SMALL, jax.random.PRNGKey(0))
    ex = _examples()
    ckpt = str(tmp_path / "best.gxt")
    stream = list(batches(ex, DATA, epochs=6))
    params, history = train(
        params, stream, TrainConfig(learning_rate=5e-3, log_every=10, checkpoint_path=ckpt)
    )
    first, last = history[0]["loss"], history[-1]["loss"]
    assert last < first * 0.8, (first, last)

    # best-by-loss checkpoint reloads into the same structure
    template = gru_textgen.init_params(SMALL, jax.random.PRNGKey(1))
    restored = load_into(ckpt, template)
    logits_a, _ = gru_textgen.forward_sequence(restored, jax.numpy.asarray(stream[0][0]))
    assert np.isfinite(np.asarray(logits_a)).all()


def test_trained_model_generates(tmp_path):
    params = gru_textgen.init_params(SMALL, jax.random.PRNGKey(0))
    ex = _examples()
    params, _ = train(params, list(batches(ex, DATA, epochs=3)), TrainConfig(log_every=100))
    tok = CharTokenizer()
    prompt, lengths = tok.encode_batch(["the "])
    ids = np.asarray(
        gru_textgen.generate(params, jax.numpy.asarray(prompt), jax.numpy.asarray(lengths), 40)
    )
    text = tok.decode(ids[0])
    assert text.startswith("the ") and len(text) == 40


def test_mixed_precision_training_reduces_loss():
    """compute_dtype=bfloat16 (master f32 weights) still converges, and its
    first-step loss agrees with f32 at bf16 tolerance."""
    import jax.numpy as jnp

    from ggml_experiments_tpu.training.gru_trainer import loss_fn

    params = gru_textgen.init_params(SMALL, jax.random.PRNGKey(0))
    ex = _examples()
    stream = list(batches(ex, DATA, epochs=6))

    # dtype parity at the start (before train() donates the param buffers)
    inp = jnp.asarray(stream[0][0])
    tgt = jnp.asarray(stream[0][1])
    l32 = float(loss_fn(params, inp, tgt))
    l16 = float(loss_fn(params, inp, tgt, compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(l16, l32, rtol=0.03)

    p_bf, hist = train(
        params, stream,
        TrainConfig(learning_rate=5e-3, log_every=10, compute_dtype=jnp.bfloat16),
    )
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.8, (hist[0], hist[-1])
    assert all(a.dtype == np.float32 for a in jax.tree_util.tree_leaves(p_bf))


def test_remat_training_matches_loss():
    """jax.checkpoint'd cell gives the same loss/gradients path (numerically)."""
    import jax.numpy as jnp
    import optax
    from ggml_experiments_tpu.training.gru_trainer import make_train_step

    params = gru_textgen.init_params(SMALL, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.integers(0, 66, (4, 12)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, 66, (4, 12)).astype(np.int32))

    p1 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    p2 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    _, _, loss_plain = make_train_step(opt)(p1, opt.init(p1), inp, tgt)
    _, _, loss_remat = make_train_step(opt, remat=True)(p2, opt.init(p2), inp, tgt)
    np.testing.assert_allclose(float(loss_plain), float(loss_remat), rtol=1e-6)


def test_prefetch_to_device_order_and_errors():
    import jax.numpy as jnp
    from ggml_experiments_tpu.training.prefetch import prefetch_to_device

    items = [(np.full((2, 2), i, np.float32), np.int32(i)) for i in range(7)]
    out = list(prefetch_to_device(iter(items), depth=3))
    assert len(out) == 7
    for i, (a, b) in enumerate(out):
        assert isinstance(a, jnp.ndarray) and float(a[0, 0]) == i and int(b) == i

    def boom():
        yield items[0]
        raise RuntimeError("producer failed")

    it = prefetch_to_device(boom())
    next(it)
    with pytest.raises(RuntimeError, match="producer failed"):
        for _ in it:
            pass


def test_validation_ppl_during_training():
    """eval_every + eval_text add held-out perplexity to the history and it
    improves as training progresses (Keras validation_data analog)."""
    from ggml_experiments_tpu.training.data import synthetic_corpus

    params, history, _ = train_from_text(
        synthetic_corpus(6000, seed=0),
        model_config=GRUConfig(vocab_size=66, embed_dim=8, units=16),
        train_config=TrainConfig(epochs=8, log_every=5, eval_every=5),
        data_config=DataConfig(seq_length=20, batch_size=8),
        eval_text=synthetic_corpus(1500, seed=1),
    )
    val = [h["val_ppl"] for h in history if "val_ppl" in h]
    assert len(val) >= 2
    assert all(np.isfinite(v) and v > 1.0 for v in val)
    assert val[-1] < val[0], val


def test_onehot_ce_matches_optax_oracle():
    """The one-hot CE rewrite (TPU gather avoidance) must be numerically
    identical to optax's take_along_axis form."""
    import optax

    from ggml_experiments_tpu.training.gru_trainer import (
        sparse_softmax_cross_entropy,
    )

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    logits = jnp.asarray(rng.standard_normal((7, 11, 66)) * 3, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 66, (7, 11)), jnp.int32)
    ours = float(sparse_softmax_cross_entropy(logits, targets))
    oracle = float(optax.softmax_cross_entropy_with_integer_labels(
        logits, targets).mean())
    np.testing.assert_allclose(ours, oracle, rtol=1e-6)


def test_exact_resume_matches_uninterrupted(tmp_path):
    """Crash-resume is EXACT: interrupt a run mid-stream, resume from the
    full train-state checkpoint (params + Adam state + step), and the final
    params are bit-identical to the uninterrupted run (the reference's
    weights-only ModelCheckpoint cannot do this — a restart loses the
    optimizer moments)."""
    import jax

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.training.gru_trainer import TrainConfig, train

    cfg = GRUConfig(vocab_size=66, embed_dim=8, units=16)
    rng = np.random.default_rng(3)

    def make_stream():
        out = []
        for _ in range(6):
            b = rng.integers(0, 66, (4, 10)).astype(np.int32)
            out.append((b, np.roll(b, -1, axis=1)))
        return out

    batches = make_stream()
    init = gru_textgen.init_params(cfg, jax.random.PRNGKey(0))
    copy = lambda p: jax.tree_util.tree_map(lambda a: np.array(a), p)  # noqa: E731

    # uninterrupted oracle
    want, _ = train(copy(init), list(batches), TrainConfig(log_every=1))

    # interrupted: 4 steps (0..3), state saved every 2 steps -> last at 2
    ck = str(tmp_path / "resume.gxt")
    tc = TrainConfig(log_every=1, resume_path=ck, save_every=2)
    train(copy(init), list(batches)[:4], tc)
    # resume: skips steps 0..2? no — skips 0..(saved step), continues at 3
    got, hist = train(copy(init), list(batches), tc)
    assert hist[0]["step"] == 3  # resumed, not restarted

    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_rejects_mismatched_checkpoint(tmp_path):
    """A resume file from a different architecture fails with a clear
    message, not a shape error deep inside jit."""
    import jax
    import pytest

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.training.gru_trainer import TrainConfig, train

    rng = np.random.default_rng(0)
    b = rng.integers(0, 66, (4, 10)).astype(np.int32)
    batches = [(b, np.roll(b, -1, axis=1))]
    ck = str(tmp_path / "resume.gxt")
    small = gru_textgen.init_params(GRUConfig(vocab_size=66, embed_dim=8, units=16),
                                    jax.random.PRNGKey(0))
    train(small, batches, TrainConfig(log_every=1, resume_path=ck, save_every=1))
    big = gru_textgen.init_params(GRUConfig(vocab_size=66, embed_dim=8, units=32),
                                  jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="does not match this model"):
        train(big, batches, TrainConfig(log_every=1, resume_path=ck, save_every=1))
