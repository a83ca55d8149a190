"""CPU smoke for tools/capacity_probe.py (the VERDICT r2 #6 measurement).

The real sweep runs on the TPU (results recorded in docs/STATUS.md); these
tests pin the harness semantics: deterministic params, a steady-state slot
load that never finishes mid-probe, correct weight-byte accounting, and a
working scan-tick worker end to end.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import capacity_probe as cp  # noqa: E402


def test_params_and_state_deterministic():
    p1, cfg = cp._make_params("q8_0")
    p2, _ = cp._make_params("q8_0")
    np.testing.assert_array_equal(np.asarray(p1.embeddings), np.asarray(p2.embeddings))
    st = cp._full_state(p1, 256, cfg.vocab_size)
    assert st.h.shape == (256, cfg.units)
    # every slot active and nowhere near finishing: pos < total by a margin
    # larger than any probe's INNER * reps
    assert int(np.asarray(st.pos).max()) + cp.INNER * cp.REPS * 10 < int(
        np.asarray(st.total).min()
    )
    assert bool(np.all(np.asarray(st.plen) <= np.asarray(st.pos)))  # past prompt


def test_weight_bytes_order():
    q8 = cp.weight_bytes("q8_0")
    q5 = cp.weight_bytes("q5_1")
    q4 = cp.weight_bytes("q4_0")
    assert q4 < q5 < q8
    # q4 codes are nibble-packed: roughly half the q8 bytes
    assert q4 < 0.62 * q8


def test_scan_worker_roundtrip(capsys, monkeypatch):
    monkeypatch.setattr(cp, "INNER", 8)
    monkeypatch.setattr(cp, "REPS", 2)
    rc = cp.single("scan", "q8_0", 64)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["tokens_per_s"] > 0
