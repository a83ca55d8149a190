"""CLI driver tests (in-process, forced-CPU platform)."""

import json
import os

import numpy as np
import pytest

from ggml_experiments_tpu.cli import build_parser, main

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
GRU = os.path.join(GOLD, "gru_small.bin")
MV = os.path.join(GOLD, "mobilevit_tiny.ggml")


def test_parser_subcommands():
    ap = build_parser()
    args = ap.parse_args(["generate", "--weights", "x.bin", "--prompt", "hi"])
    assert args.cmd == "generate" and args.steps == 200  # reference default
    with pytest.raises(SystemExit):
        ap.parse_args(["generate"])  # --weights required


def test_generate_cli_golden(capsys):
    gold = np.load(os.path.join(GOLD, "gru_small.npz"))
    rc = main([
        "generate", "--weights", GRU, "--prompt", "ROMEO: ", "--steps", "60",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

    want = CharTokenizer().decode(gold["decode_ids"])
    assert want in out


def test_generate_cli_batch_and_temperature(capsys):
    rc = main([
        "generate", "--weights", GRU, "--prompt", "KING ", "--prompt", "QUEEN ",
        "--steps", "20", "--temperature", "0.8", "--qtype", "q4_0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("--------") == 2


def test_features_cli_reference_format(capsys):
    rc = main(["features", "--weights", MV])
    assert rc == 0
    out = capsys.readouterr().out
    assert "output feature shape: : Dims: (8, 8, 96)" in out
    assert "i0 = 0, i1 = 0" in out


def test_quantize_cli_roundtrip(tmp_path, capsys):
    out_path = str(tmp_path / "gru.gxt")
    rc = main(["quantize", "--input", GRU, "--output", out_path, "--qtype", "q8_0"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["qtype"] == "q8_0" and os.path.exists(out_path)
    # serve directly from the quantized checkpoint
    rc = main(["generate", "--weights", out_path, "--prompt", "ROMEO: ", "--steps", "30"])
    assert rc == 0


def test_quantize_cli_calibrated_q4_k_m(tmp_path, capsys):
    """The calibrated GPTQ recipe end-to-end through the CLI: quantize with
    a calibration corpus, then generate from the mixed-qtype checkpoint."""
    corpus = tmp_path / "cal.txt"
    from ggml_experiments_tpu.training.data import synthetic_corpus

    corpus.write_text(synthetic_corpus(30000))
    out_path = str(tmp_path / "gru_km.gxt")
    rc = main(["quantize", "--input", GRU, "--output", out_path,
               "--qtype", "q4_k_m", "--calibrate", str(corpus),
               "--calibrate-seqs", "16"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["qtype"] == "q4_k_m" and rec["calibrated"]
    # the goldens GRU is tiny, so lane padding dominates its bits/weight;
    # the < 5 bits contract is asserted on the full-size trained checkpoint
    # (test_trained_model.py::test_q4_k_m_gptq_closes_4bit_contract)
    assert rec["bits_per_weight"] > 0
    from ggml_experiments_tpu.formats.gru_bin import load_gru_any

    p = load_gru_any(out_path)
    assert p.cell.recurrent_kernel.qtype == "q4_k"
    assert p.dense_kernel.qtype == "q8_0"
    rc = main(["generate", "--weights", out_path, "--prompt", "ROMEO: ",
               "--steps", "20"])
    assert rc == 0
    # q4_k_m without --calibrate is a usage error, not a crash
    assert main(["quantize", "--input", GRU, "--output", out_path,
                 "--qtype", "q4_k_m"]) == 2


def test_train_gru_cli(tmp_path, capsys):
    corpus = tmp_path / "corpus.txt"
    from ggml_experiments_tpu.training.data import synthetic_corpus

    corpus.write_text(synthetic_corpus(4000))
    out_bin = str(tmp_path / "trained.bin")
    rc = main([
        "train-gru", "--corpus", str(corpus), "--epochs", "1", "--seq-length", "16",
        "--batch-size", "8", "--embed-dim", "8", "--units", "16",
        "--output", out_bin, "--log-every", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "exported weights" in out
    rec = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(rec["final_loss"])
    # the exported file loads back through the reference-format reader
    from ggml_experiments_tpu.formats.gru_bin import load_gru_params

    p = load_gru_params(out_bin)
    assert p.embeddings.shape == (66, 8) and p.units == 16


def test_eval_cli(capsys):
    rc = main(["eval", "--weights", GRU, "--qtype", "q8_0", "--batch", "2", "--length", "16"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["qtype"] == "q8_0" and rec["top1_agreement"] > 0.9 and "ppl_a" in rec


def test_aot_export_run_cli_mobilevit(tmp_path, capsys):
    """aot-export with default flags (regression: --image-size default was None
    and crashed export), then aot-run with the qtype defaulted from the
    artifact metadata."""
    art = str(tmp_path / "feat.gxa")
    rc = main(["aot-export", "--model", "mobilevit", "--weights", MV,
               "--output", art, "--batch", "1", "--qtype", "q8_0"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["kind"] == "mobilevit-features" and rec["qtype"] == "q8_0"
    assert rec["image_size"] == 256
    rc = main(["aot-run", "--artifact", art, "--weights", MV])  # no --qtype
    assert rc == 0
    out = capsys.readouterr().out
    assert "output feature shape" in out and "i0 = 0, i1 = 0" in out


def test_aot_run_cli_qtype_mismatch_rejected(tmp_path, capsys):
    art = str(tmp_path / "dec.gxa")
    rc = main(["aot-export", "--model", "gru", "--weights", GRU, "--output", art,
               "--batch", "1", "--prompt-len", "4", "--steps", "8",
               "--qtype", "q8_0"])
    assert rc == 0
    capsys.readouterr()
    with pytest.raises(SystemExit, match="does not match the artifact"):
        main(["aot-run", "--artifact", art, "--weights", GRU, "--qtype", "q4_0"])


def test_cli_bench_gru_smoke(capsys):
    """gxt bench runs on CPU at a tiny config and emits protocol-stamped JSON."""
    import json

    from ggml_experiments_tpu.cli import main

    rc = main(["bench", "--model", "gru", "--batch", "4", "--steps", "8",
               "--platform", "cpu", "--compute", "bfloat16"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["model"] == "gru" and out["tokens_per_s"] > 0
    assert out["protocol"]["rev"] >= 3
