"""Train the char GRU and export reference-format weights.

The reference's training script (rnn_text_generation.py) end-to-end in JAX:
corpus -> seq-100 batches -> Adam + sparse CE -> best-by-loss checkpoint ->
gru.bin export readable by the reference's C++ loader.

    python examples/train_and_export.py corpus.txt out/gru.bin [epochs]
"""

import sys

from ggml_experiments_tpu.formats.gru_bin import save_gru_params
from ggml_experiments_tpu.training import TrainConfig, train_from_text
from ggml_experiments_tpu.training.data import load_corpus


def main(corpus: str, out_path: str, epochs: str = "20"):
    text = load_corpus(corpus)
    params, history, tok = train_from_text(
        text,
        train_config=TrainConfig(
            epochs=int(epochs),
            checkpoint_path=out_path + ".best.gxt",
        ),
    )
    save_gru_params(out_path, params)
    print(f"final loss {history[-1]['loss']:.4f}; wrote {out_path} "
          f"(+ best checkpoint {out_path}.best.gxt)")


if __name__ == "__main__":
    main(*sys.argv[1:])
