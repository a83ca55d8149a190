"""HTTP front-end (serving/http.py) over a live engine: parity with the
engine API, streaming, cancel, health/stats, and error mapping."""

import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.models.gru_textgen import GRUConfig
from ggml_experiments_tpu.serving import DecodeEngine
from ggml_experiments_tpu.serving.http import HttpFrontend
from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

CFG = GRUConfig(vocab_size=66, embed_dim=16, units=32)
TOK = CharTokenizer()


@pytest.fixture(scope="module")
def served():
    params = gru_textgen.init_params(CFG, jax.random.PRNGKey(7))
    eng = DecodeEngine(params, n_slots=4, max_prompt=16, inner_steps=8,
                       max_pending=64)
    eng.start()
    front = HttpFrontend(eng, TOK, port=0, request_timeout_s=120.0)
    front.start()
    yield params, eng, front
    front.stop()
    eng.stop()


def _post(front, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{front.port}/v1/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_generate_matches_engine(served):
    params, eng, front = served
    body = json.loads(_post(front, {"prompt": "the ", "max_new_tokens": 15}).read())
    assert body["canceled"] is False
    # same prompt through the engine API directly: greedy is deterministic
    want = eng.submit(TOK.encode("the "), 15)
    eng_tokens = want.result(timeout=60)
    np.testing.assert_array_equal(np.asarray(body["tokens"]), eng_tokens)
    assert body["text"] == TOK.decode(int(t) for t in eng_tokens)


def test_streaming_chunks_arrive_per_token(served):
    params, eng, front = served
    resp = _post(front, {"prompt": "ab", "max_new_tokens": 10, "stream": True})
    assert resp.headers["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(l) for l in resp.read().splitlines() if l.strip()]
    assert "id" in lines[0]
    toks = [l["token"] for l in lines[1:-1]]
    final = lines[-1]
    assert final["done"] is True and final["generated"] == len(toks)
    # stream tokens match the non-streaming result for the same prompt
    body = json.loads(_post(front, {"prompt": "ab", "max_new_tokens": 10}).read())
    assert toks == body["tokens"][-len(toks):]


def test_health_and_stats(served):
    _, eng, front = served
    health = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{front.port}/v1/health", timeout=30).read())
    assert health["status"] == "ok" and health["slots"] == 4
    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{front.port}/v1/stats", timeout=30).read())
    assert stats["tokens_generated"] > 0
    assert stats["requests_completed"] >= 1


def test_cancel_via_delete(served):
    params, eng, front = served
    resp = _post(front, {"prompt": "zz", "max_new_tokens": 5})
    rid = json.loads(resp.read())["id"]
    # completed request: cancel is a no-op but the id resolves
    out = json.loads(urllib.request.urlopen(urllib.request.Request(
        f"http://127.0.0.1:{front.port}/v1/requests/{rid}", method="DELETE"
    ), timeout=30).read())
    assert out == {"id": rid, "canceled": True}


def test_bad_requests_map_to_http_errors(served):
    _, eng, front = served
    with pytest.raises(urllib.error.HTTPError) as ex:
        _post(front, {"prompt": ""})
    assert ex.value.code == 400
    # longer-than-max_prompt prompts are clipped, not rejected
    assert json.loads(_post(front, {"prompt": "x" * 500,
                                    "max_new_tokens": 3}).read())["tokens"]
    # a sampling request on a greedy engine is a 400
    with pytest.raises(urllib.error.HTTPError) as ex:
        _post(front, {"prompt": "ok", "temperature": 0.8})
    assert ex.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ex:
        urllib.request.urlopen(
            f"http://127.0.0.1:{front.port}/v1/nope", timeout=30)
    assert ex.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ex:
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/requests/99999", method="DELETE"
        ), timeout=30)
    assert ex.value.code == 404


def test_serve_http_cli_subprocess():
    """`gxt serve --http 0` end to end: boots, prints its port, answers a
    generate request, and dies on SIGTERM."""
    import os
    import re
    import select
    import subprocess
    import sys

    gold = os.path.join(os.path.dirname(__file__), "goldens", "gru_small.bin")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "ggml_experiments_tpu", "serve",
         "--weights", gold, "--http", "0", "--platform", "cpu",
         "--slots", "2", "--inner-steps", "4"],
        stderr=subprocess.PIPE, cwd=repo,
    )
    try:
        port = None
        buf = b""
        for _ in range(1200):  # up to 120 s for the subprocess to boot
            r, _, _ = select.select([proc.stderr], [], [], 0.1)
            if r:
                buf += os.read(proc.stderr.fileno(), 4096)
                m = re.search(rb"serving HTTP on 127\.0\.0\.1:(\d+)", buf)
                if m:
                    port = int(m.group(1))
                    break
            assert proc.poll() is None, f"serve exited early: {buf!r}"
        assert port, f"no port line in stderr: {buf!r}"
        body = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate",
            data=json.dumps({"prompt": "hi ", "max_new_tokens": 8}).encode(),
            headers={"Content-Type": "application/json"},
        ), timeout=120).read())
        assert len(body["tokens"]) == len("hi ") + 8
    finally:
        proc.terminate()  # exact PID we spawned
        proc.wait(timeout=30)


def test_concurrent_clients(served):
    """8 concurrent HTTP clients through 4 slots all complete with correct,
    deterministic results."""
    import concurrent.futures

    params, eng, front = served
    prompts = ["a", "bb", "ccc", "dd d", "ee", "f", "gg", "hhh"]

    def one(p):
        body = json.loads(_post(front, {"prompt": p, "max_new_tokens": 12}).read())
        return p, body["tokens"]

    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        results = dict(pool.map(one, prompts))
    for p in prompts:
        want = eng.submit(TOK.encode(p), 12).result(timeout=60)
        np.testing.assert_array_equal(np.asarray(results[p]), want)
