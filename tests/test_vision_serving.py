"""Continuous-batching vision engine + HTTP image endpoints (VERDICT r4 #5).

Runs on the tiny trained checkpoint on CPU; the at-scale throughput soak
(>= 70% of the offline B=128 img/s bar) runs on the chip via
tools/vision_serving_soak.py with numbers recorded in docs/STATUS.md.
"""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import os

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                    "mobilevit_synth.ggml")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="trained checkpoint not present")


@pytest.fixture(scope="module")
def vparams():
    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.training.image_task import TINY_CLS_CONFIG

    return load_mobilevit(CKPT, config=TINY_CLS_CONFIG, qtype="q8_0",
                          flash_attn=False, fused_layer=False)


@pytest.fixture(scope="module")
def images():
    from ggml_experiments_tpu.training.image_task import make_dataset

    x, y = make_dataset(24, seed=5, image_size=64)
    return np.asarray(x), np.asarray(y)


def test_vision_engine_matches_offline(vparams, images):
    import jax

    from ggml_experiments_tpu.models.mobilevit import classify
    from ggml_experiments_tpu.serving.vision import VisionEngine

    x, _ = images
    eng = VisionEngine(vparams, image_size=64, batch_sizes=(4, 16),
                       compute_dtype=np.float32, transport="f32")
    eng.start()
    try:
        reqs = [eng.submit(x[i]) for i in range(12)]
        outs = np.stack([r.result(timeout=120) for r in reqs])
    finally:
        eng.stop()
    want = np.asarray(jax.jit(classify)(vparams, x[:12]))
    np.testing.assert_allclose(outs, want, rtol=1e-5, atol=1e-4)
    assert eng.stats.images_done == 12 and eng.error is None
    assert eng.stats.batches >= 1


def test_vision_engine_mixed_kinds_and_cancel(vparams, images):
    from ggml_experiments_tpu.serving.vision import VisionEngine

    x, _ = images
    eng = VisionEngine(vparams, image_size=64, batch_sizes=(4, 16),
                       compute_dtype=np.float32, transport="f32")
    # submit BEFORE start so cancels land while queued
    r_cls = [eng.submit(x[i], "classify") for i in range(6)]
    r_feat = [eng.submit(x[i], "features") for i in range(3)]
    r_cancel = eng.submit(x[6], "classify")
    r_cancel.cancel()
    eng.run_until_idle(timeout=300)
    eng.stop()
    for r in r_cls:
        assert r.result(timeout=1).shape[-1] == 44   # logits
    for r in r_feat:
        assert r.result(timeout=1).ndim == 3         # (H', W', C)
    with pytest.raises(RuntimeError, match="canceled"):
        r_cancel.result(timeout=1)
    assert eng.stats.requests_canceled == 1
    assert eng.error is None


def test_vision_engine_input_validation(vparams):
    from ggml_experiments_tpu.serving.vision import VisionEngine

    eng = VisionEngine(vparams, image_size=64, transport="f32")
    with pytest.raises(ValueError, match="shape"):
        eng.submit(np.zeros((32, 32, 3), np.float32))
    with pytest.raises(ValueError, match="expects uint8"):
        VisionEngine(vparams, image_size=64).submit(
            np.zeros((64, 64, 3), np.float32))
    with pytest.raises(ValueError, match="kind"):
        eng.submit(np.zeros((64, 64, 3), np.float32), "segment")


def _png_bytes(img_u8: np.ndarray) -> bytes:
    """Minimal PNG writer (stored zlib) for the HTTP test payload."""
    import struct
    import zlib

    h, w, _ = img_u8.shape
    raw = b"".join(b"\x00" + img_u8[r].tobytes() for r in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_http_vision_endpoints(vparams, images):
    from ggml_experiments_tpu.serving.http import HttpFrontend
    from ggml_experiments_tpu.serving.vision import VisionEngine

    x, _ = images
    u8 = np.clip(x[0] * 255.0, 0, 255).astype(np.uint8)
    png = _png_bytes(u8)

    eng = VisionEngine(vparams, image_size=64, batch_sizes=(4,),
                       compute_dtype=np.float32, transport="f32")
    eng.start()
    front = HttpFrontend(None, vision=eng, port=0)
    front.start()
    base = f"http://127.0.0.1:{front.port}"
    try:
        body = json.dumps({"image_b64": base64.b64encode(png).decode(),
                           "top_k": 3}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                base + "/v1/classify", data=body,
                headers={"Content-Type": "application/json"})) as r:
            rep = json.loads(r.read())
        assert len(rep["top"]) == 3 and all(len(t) == 2 for t in rep["top"])

        # raw image body (content sniffing)
        with urllib.request.urlopen(urllib.request.Request(
                base + "/v1/features", data=png,
                headers={"Content-Type": "image/png"})) as r:
            rep = json.loads(r.read())
        assert len(rep["first5"]) == 5 and len(rep["shape"]) == 3

        with urllib.request.urlopen(base + "/v1/vision/stats") as r:
            st = json.loads(r.read())
        assert st["images_done"] >= 2

        with urllib.request.urlopen(base + "/v1/health") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and "vision_pending" in h

        # bad payload -> 400
        bad = urllib.request.Request(
            base + "/v1/classify", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        front.stop()
        eng.stop()


def test_vision_engine_worker_failure_releases_waiters(vparams):
    from ggml_experiments_tpu.serving.vision import VisionEngine

    eng = VisionEngine(vparams, image_size=64, batch_sizes=(4,),
                       compute_dtype=np.float32, transport="f32")
    # poison the forward: engine thread must die cleanly and release waiters
    eng._fns["classify"] = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected device failure"))
    req = eng.submit(np.zeros((64, 64, 3), np.float32))
    eng.start()
    with pytest.raises(RuntimeError, match="injected"):
        req.result(timeout=60)
    assert eng.error is not None
    with pytest.raises(RuntimeError, match="failed"):
        eng.submit(np.zeros((64, 64, 3), np.float32))
