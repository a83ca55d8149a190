"""Generate golden test fixtures from the TF oracle (run offline, commit outputs).

The reference repo ships no weight files (SURVEY.md §6: .gitignore excludes
*.ggml/*.bin) and its golden vector needs the unfetchable apple/mobilevit-small
checkpoint, so ground truth is regenerated here exactly as SURVEY.md §4 plans:
random-but-seeded TF models (the same Keras/HF classes the reference trains or
converts from), exported through the reference's own binary formats, plus the
TF outputs our JAX implementations must reproduce.

Fixtures (committed under tests/goldens/):
  gru_small.bin / gru_small.npz  — tf.keras GRU stack (reference
      rnn_text_generation.py:52-78 at reduced width), reference-format export
      (.py:102-115), teacher-forced logits + greedy decode ids.
  mobilevit_tiny.ggml / mobilevit_tiny.npz — HF TFMobileViTModel at a reduced
      config, reference-format export (convert-tf-to-ggml.py:16-33), features
      for the synthetic golden image (main.cpp:681-688).

Usage:  python tools/make_goldens.py  (needs TF + transformers; ~2 min)
"""

import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

VOCAB = "\t\n !$&',-.3:;?ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def make_gru():
    import tensorflow as tf

    tf.keras.utils.set_random_seed(0)
    vocab_size, embed_dim, units = 66, 32, 48

    embedding = tf.keras.layers.Embedding(vocab_size, embed_dim)
    gru = tf.keras.layers.GRU(units, return_sequences=True, return_state=True)
    dense = tf.keras.layers.Dense(vocab_size)

    # build
    x = embedding(tf.zeros((1, 4), tf.int32))
    y, s = gru(x)
    dense(y)

    weights = embedding.weights + gru.weights + dense.weights
    names = [w.name if hasattr(w, "name") else str(w) for w in weights]
    print("GRU weights:", [(n, tuple(w.shape)) for n, w in zip(names, weights)])

    # export in the reference gru.bin format (rnn_text_generation.py:104-115)
    path_bin = os.path.join(OUT, "gru_small.bin")
    with open(path_bin, "wb") as f:
        for w in weights:
            a = w.numpy().astype(np.float32)
            f.write(struct.pack("i", a.ndim))
            for i in range(a.ndim):
                f.write(struct.pack("i", a.shape[a.ndim - 1 - i]))
            a.tofile(f)

    # teacher-forced logits over a fixed sequence
    rng = np.random.default_rng(0)
    seq = rng.integers(0, vocab_size, size=(2, 30)).astype(np.int32)
    e = embedding(seq)
    h, _ = gru(e)
    logits = dense(h).numpy()

    # greedy decode with the reference's exact loop semantics (.cpp:293-313)
    prompt = np.array([VOCAB.index(c) for c in "ROMEO: "], np.int32)
    total = 60
    state = tf.zeros((1, units))
    toks = []
    prev = int(prompt[0])
    for j in range(total):
        tok = int(prompt[j]) if j < len(prompt) else prev
        toks.append(tok)
        e = embedding(np.array([[tok]], np.int32))
        y, state = gru(e, initial_state=state)
        prev = int(np.argmax(dense(y).numpy()[0, 0]))

    np.savez(
        os.path.join(OUT, "gru_small.npz"),
        seq=seq,
        logits=logits,
        prompt=prompt,
        decode_ids=np.array(toks, np.int32),
        total=np.int32(total),
    )
    print("gru_small: logits", logits.shape, "decode", toks[:20])


def make_mobilevit():
    from transformers import MobileViTConfig, TFMobileViTModel

    import tensorflow as tf

    tf.keras.utils.set_random_seed(1)
    cfg = MobileViTConfig(
        image_size=64,
        neck_hidden_sizes=[8, 16, 24, 32, 40, 48, 96],
        hidden_sizes=[24, 32, 40],
        num_attention_heads=4,
        expand_ratio=4.0,
        mlp_ratio=2.0,
        patch_size=2,
        conv_kernel_size=3,
        output_stride=32,
        layer_norm_eps=1e-5,
        qkv_bias=True,
        hidden_act="silu",
    )
    model = TFMobileViTModel(cfg, name="tf_mobile_vi_t_model")
    # build with channels-first input (HF TF port expects NCHW like torch)
    from ggml_experiments_tpu.utils.image import synthetic_test_image

    img = synthetic_test_image(64)  # (64, 64, 3) float32 HWC
    inp = img.transpose(2, 0, 1)[None]  # (1, 3, 64, 64)
    out = model(pixel_values=inp, training=False)
    feats = out.last_hidden_state.numpy()  # (1, C, H', W') channels-first
    print("mobilevit_tiny features:", feats.shape)

    # export weights in the reference weight.ggml format (convert-tf-to-ggml.py)
    path = os.path.join(OUT, "mobilevit_tiny.ggml")
    with open(path, "wb") as f:
        for w in model.weights:
            name = w.name.encode("ascii")
            a = w.numpy().astype(np.float32)
            f.write(struct.pack("i", len(name)))
            f.write(name)
            f.write(struct.pack("i", a.ndim))
            for d in a.shape:
                f.write(struct.pack("i", d))
            a.tofile(f)
    print("wrote", path, os.path.getsize(path), "bytes;", len(model.weights), "weights")
    print("first names:", [w.name for w in model.weights[:3]])

    np.savez(
        os.path.join(OUT, "mobilevit_tiny.npz"),
        image=img,
        features_chw=feats,
    )


def make_mobilevit_full():
    """FULL-size-config TF parity oracle (256px, hidden 144/192/240, layers
    2/4/3 — the real apple/mobilevit-small architecture, random weights).

    Closes the tiny-config-only golden gap: the full wiring (strides, stage
    depths, head splits at hidden 144/192/240) is checked against TF, not
    just against itself. Instead of committing ~22 MB of weights, the seeded
    ``random_named_tensors`` map is assigned INTO the TF model, so the test
    regenerates identical weights and only the features npz is committed.
    """
    from transformers import MobileViTConfig, TFMobileViTModel

    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig as OurConfig, random_named_tensors,
    )
    from ggml_experiments_tpu.utils.image import synthetic_test_image

    cfg = MobileViTConfig()  # defaults ARE apple/mobilevit-small (main.cpp:35-53)
    model = TFMobileViTModel(cfg, name="tf_mobile_vi_t_model")
    img = synthetic_test_image(256)
    model(pixel_values=img.transpose(2, 0, 1)[None], training=False)  # build

    tensors = random_named_tensors(OurConfig(), seed=11)
    missing = [w.name for w in model.weights if w.name not in tensors]
    assert not missing, f"random_named_tensors lacks: {missing[:5]}"
    for w in model.weights:
        w.assign(tensors[w.name])

    feats = model(pixel_values=img.transpose(2, 0, 1)[None], training=False)
    feats = feats.last_hidden_state.numpy()
    print("mobilevit_full features:", feats.shape, feats[0, :3, 0, 0])
    np.savez(os.path.join(OUT, "mobilevit_full.npz"), features_chw=feats,
             seed=np.int32(11))


def make_mobilevit_classifier():
    """Tiny TFMobileViTForImageClassification oracle (BASELINE config 3)."""
    from transformers import MobileViTConfig, TFMobileViTForImageClassification

    import tensorflow as tf

    tf.keras.utils.set_random_seed(2)
    cfg = MobileViTConfig(
        image_size=64,
        neck_hidden_sizes=[8, 16, 24, 32, 40, 48, 96],
        hidden_sizes=[24, 32, 40],
        num_attention_heads=4,
        expand_ratio=4.0,
        mlp_ratio=2.0,
        patch_size=2,
        conv_kernel_size=3,
        output_stride=32,
        layer_norm_eps=1e-5,
        qkv_bias=True,
        hidden_act="silu",
        num_labels=12,
    )
    model = TFMobileViTForImageClassification(cfg)

    from ggml_experiments_tpu.utils.image import synthetic_test_image

    img = synthetic_test_image(64)
    out = model(pixel_values=img.transpose(2, 0, 1)[None], training=False)
    logits = out.logits.numpy()
    print("classifier logits:", logits.shape, logits[0, :4])

    path = os.path.join(OUT, "mobilevit_cls_tiny.ggml")
    with open(path, "wb") as f:
        for w in model.weights:
            name = w.name.encode("ascii")
            a = w.numpy().astype(np.float32)
            f.write(struct.pack("i", len(name)))
            f.write(name)
            f.write(struct.pack("i", a.ndim))
            for d in a.shape:
                f.write(struct.pack("i", d))
            a.tofile(f)
    print("wrote", path, "first names:", [w.name for w in model.weights[:1]],
          "classifier:", [w.name for w in model.weights if "classifier" in w.name])
    np.savez(os.path.join(OUT, "mobilevit_cls_tiny.npz"), image=img, logits=logits)


if __name__ == "__main__":
    import sys

    os.makedirs(OUT, exist_ok=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gru"):
        make_gru()
    if which in ("all", "mobilevit"):
        make_mobilevit()
    if which in ("all", "mobilevit_full"):
        make_mobilevit_full()
    if which in ("all", "classifier"):
        make_mobilevit_classifier()
    print("done")
