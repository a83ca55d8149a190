"""Multihost: single-process degenerate behavior + REAL 2-process execution.

The 2-process tests spawn two ``jax.distributed`` worker subprocesses (4
virtual CPU devices each -> one global 8-device mesh across 2 "hosts") and
assert (a) both processes agree bit-for-bit, and (b) the multi-host result
matches a single-process oracle — for the DP+TP train step and for a
continuous-batching serving session with the refill broadcast
(serving/engine.py multi-host design)."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ggml_experiments_tpu.parallel import make_mesh
from ggml_experiments_tpu.parallel.multihost import (
    global_array_from_host_data,
    host_local_batch_slice,
    initialize,
    is_primary,
    sync_hosts,
)

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _run_n_process(scenario: str, nproc: int, timeout: int = 420):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own platform config
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(nproc), scenario],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err[-4000:]}"
            result = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
            assert result, f"no RESULT line:\n{out}\n{err[-4000:]}"
            outs.append(json.loads(result[-1][len("RESULT "):]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return sorted(outs, key=lambda o: o["pid"])


def _run_two_process(scenario: str, timeout: int = 420):
    return _run_n_process(scenario, 2, timeout)


def test_two_process_train_step():
    """DP+TP training executes across 2 real processes: identical losses on
    both hosts, and identical to the single-process 8-device run."""
    r0, r1 = _run_two_process("train")
    assert r0["losses"] == r1["losses"], (r0, r1)
    assert r0["checksum"] == r1["checksum"]
    # single-process oracle on this process's own 8-device mesh
    import optax

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.parallel.sharding import gru_param_specs, place
    from ggml_experiments_tpu.training.gru_trainer import make_train_step

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(0))
    )
    mesh = make_mesh((2, 4))
    params = place(params, gru_param_specs(params), mesh)
    opt = optax.adam(1e-3)
    opt_state = jax.jit(opt.init)(params)
    step = make_train_step(opt, mesh)
    rng = np.random.default_rng(42)
    want = []
    for _ in range(3):
        inputs = rng.integers(0, 66, (16, 24)).astype(np.int32)
        targets = np.roll(inputs, -1, axis=1)
        gi = global_array_from_host_data(mesh, P("data"), inputs)
        gt = global_array_from_host_data(mesh, P("data"), targets)
        params, opt_state, loss = step(params, opt_state, gi, gt)
        want.append(float(loss))
    np.testing.assert_allclose(r0["losses"], want, rtol=1e-5)


def test_two_process_serving_session():
    """Continuous batching across 2 processes (refill broadcast, SPMD
    lockstep): primary-host tokens match the single-process offline decode."""
    r0, r1 = _run_two_process("serve")
    assert r0["device_steps"] == r1["device_steps"] > 0
    assert r0["tokens"], "primary produced no results"
    assert r1["tokens"] == {}, "follower must not own requests"

    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = gru_textgen.init_params(cfg, jax.random.PRNGKey(7))
    for prompt, new in [([5, 9, 13], 20), ([2], 15), ([11, 3], 18)]:
        ids = np.asarray(prompt, np.int32)[None, :]
        want = np.asarray(
            gru_textgen.generate(
                params, jnp.asarray(ids),
                jnp.asarray([len(prompt)], np.int32), len(prompt) + new,
            )
        )[0]
        got = r0["tokens"][str(tuple(prompt))]
        np.testing.assert_array_equal(got, want)


def test_two_process_vision_forward():
    """DP MobileViT inference across 2 processes, fused-layer kernel active:
    hosts agree bit-for-bit and match the single-process oracle."""
    r0, r1 = _run_two_process("vision")
    assert r0["checksum"] == r1["checksum"]
    assert r0["first"] == r1["first"]

    import jax.numpy as jnp

    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
    )

    cfg = MobileViTConfig(
        image_size=64, hidden_sizes=(16, 24, 32),
        neck_hidden_sizes=(8, 16, 16, 24, 32, 40, 64),
        num_transformer_layers=(1, 1, 1),
    )
    params = from_named_tensors(
        random_named_tensors(cfg, seed=3), cfg, flash_attn=False, fused_layer=True
    )
    imgs = np.random.default_rng(9).standard_normal((8, 64, 64, 3)).astype(np.float32)
    want = np.asarray(
        extract_features(params, jnp.asarray(imgs), compute_dtype=jnp.bfloat16),
        np.float32,
    )
    np.testing.assert_allclose(r0["first"], want[0, 0, 0, :4], rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(
        r0["checksum"], np.abs(want).sum(), rtol=2e-2
    )


def test_two_process_tensor_parallel():
    """TP across the host boundary: the model axis spans both processes, so
    every gate/head collective is cross-host. Hosts agree bit-for-bit and
    match the single-process (1, 8) oracle."""
    r0, r1 = _run_two_process("tp")
    assert r0["losses"] == r1["losses"]
    assert r0["checksum"] == r1["checksum"]

    import jax.numpy as jnp
    import optax

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.parallel.sharding import gru_param_specs, place
    from ggml_experiments_tpu.training.gru_trainer import make_train_step

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(5))
    )
    mesh = make_mesh((1, 8))
    params = place(params, gru_param_specs(params), mesh)
    opt = optax.adam(1e-3)
    opt_state = jax.jit(opt.init)(params)
    step = make_train_step(opt, mesh)
    rng = np.random.default_rng(77)
    want = []
    for _ in range(3):
        inputs = rng.integers(0, 66, (8, 16)).astype(np.int32)
        targets = np.roll(inputs, -1, axis=1)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(inputs), jnp.asarray(targets)
        )
        want.append(float(loss))
    np.testing.assert_allclose(r0["losses"], want, rtol=1e-5)


def test_two_process_tp_serving_session():
    """Continuous-batching serving with the MODEL axis spanning both hosts:
    every decode step's TP collectives are cross-host, and the primary's
    tokens still match the single-process offline decode exactly."""
    r0, r1 = _run_two_process("tp_serve")
    assert r0["device_steps"] == r1["device_steps"] > 0
    assert r0["tokens"] and r1["tokens"] == {}

    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = gru_textgen.init_params(cfg, jax.random.PRNGKey(7))
    for prompt, new in [([5, 9, 13], 20), ([2], 15), ([11, 3], 18)]:
        ids = np.asarray(prompt, np.int32)[None, :]
        want = np.asarray(
            gru_textgen.generate(
                params, jnp.asarray(ids),
                jnp.asarray([len(prompt)], np.int32), len(prompt) + new,
            )
        )[0]
        np.testing.assert_array_equal(r0["tokens"][str(tuple(prompt))], want)


def _offline_q8_f32_oracle(prompt, new):
    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.quant import quantize

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    fp = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(7))
    )
    qp = gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray(fp.embeddings),
        cell=type(fp.cell)(
            kernel=quantize(fp.cell.kernel, "q8_0"),
            recurrent_kernel=quantize(fp.cell.recurrent_kernel, "q8_0"),
            bias=jnp.asarray(fp.cell.bias),
        ),
        dense_kernel=quantize(fp.dense_kernel, "q8_0"),
        dense_bias=jnp.asarray(fp.dense_bias),
    )
    ids = np.asarray(prompt, np.int32)[None, :]
    return np.asarray(
        gru_textgen.generate(
            qp, jnp.asarray(ids), jnp.asarray([len(prompt)], np.int32),
            len(prompt) + new,
        )
    )[0]


def test_two_process_fused_tick_serving():
    """Multi-process serving THROUGH THE FUSED TICK (VERDICT r2 #5): the
    kernel's slot axis is sharded over 'data' (each process ticks only its
    local slots via the custom_partitioning rule), outputs all-gather back,
    and the primary's tokens match the single-process offline q8/f32 decode
    exactly."""
    r0, r1 = _run_two_process("fused_serve")
    assert r0["fused"] and r1["fused"]
    assert r0["slot_axis"] == r1["slot_axis"] == "data"
    assert r0["device_steps"] == r1["device_steps"] > 0
    assert r0["tokens"] and r1["tokens"] == {}
    assert r0["state_digest"] == r1["state_digest"]
    for i, (prompt, new) in enumerate([([5, 9, 13], 20), ([2], 15),
                                       ([11, 3], 18)]):
        want = _offline_q8_f32_oracle(prompt, new)
        np.testing.assert_array_equal(r0["tokens"][f"{i}:{tuple(prompt)}"], want)


def test_two_process_sampled_fused_tick_serving():
    """Sampled multi-process serving through the fused tick (VERDICT r3:
    previously forced onto the scan — the PRNG seeded identically on every
    slot shard): the greedy request stays token-exact vs the oracle,
    identical sampled prompts draw decorrelated streams, every token is
    in-vocab, and the replicated state digest matches across processes
    (sampled SPMD divergence would split it)."""
    r0, r1 = _run_two_process("sampled_fused_serve")
    assert r0["fused"] and r1["fused"]
    assert r0["slot_axis"] == r1["slot_axis"] == "data"
    assert r0["state_digest"] == r1["state_digest"]
    assert r0["tokens"] and r1["tokens"] == {}
    want = _offline_q8_f32_oracle([5, 9, 13], 20)
    np.testing.assert_array_equal(r0["tokens"]["0:(5, 9, 13)"], want)
    s1 = r0["tokens"]["1:(2, 4)"]
    s2 = r0["tokens"]["2:(2, 4)"]
    assert len(s1) == len(s2) == 2 + 15
    assert all(0 <= t < 66 for t in s1 + s2)
    assert s1 != s2, "identical sampled prompts drew correlated streams"


def test_host_death_snapshot_recovery(tmp_path):
    """VERDICT r4 #7, end-to-end: a 2-process serving session snapshots
    mid-decode, one host is killed abruptly (os._exit inside the worker, no
    shutdown), the survivor observes the session die — and the snapshot
    restores on a FRESH single-process session that finishes every
    in-flight/queued request with tokens exactly equal to an uninterrupted
    run (the checkpointed request queue tolerates host restart,
    SURVEY.md §5 failure-recovery row)."""
    snap = str(tmp_path / "recover.gxt")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["GXT_RECOVER_SNAP"] = snap
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", "recover_die"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    try:
        out0, err0 = procs[0].communicate(timeout=420)
        out1, err1 = procs[1].communicate(timeout=420)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert procs[1].returncode == 17, f"worker 1 did not die as scripted:\n{err1[-2000:]}"
    assert procs[0].returncode == 0, f"survivor failed:\n{out0}\n{err0[-4000:]}"
    lines = [ln for ln in out0.splitlines() if ln.startswith("RESULT ")]
    assert lines, f"no RESULT from survivor:\n{out0}\n{err0[-2000:]}"
    r0 = json.loads(lines[-1][len("RESULT "):])
    assert r0["snapshot_written"]
    # the survivor must NOT have silently completed an SPMD tick without
    # its peer — host death ends the session (error or wedge both qualify)
    assert r0["peer_death"] in ("error", "wedged"), r0

    # ---- phase 2: restore on ONE host, drain, compare to uninterrupted ----
    import jax.numpy as jnp

    from ggml_experiments_tpu.serving import DecodeEngine
    from tests.multihost_worker import RECOVER_SPECS, recover_qparams

    qp = recover_qparams()
    eng2 = DecodeEngine.restore(snap, qp, inner_steps=8,
                                compute_dtype=jnp.float32)
    assert len(eng2.restored_requests) == len(RECOVER_SPECS)
    eng2.run_until_idle(timeout_s=300)
    got = {tuple(r.prompt_ids.tolist()): r.result(timeout=5)
           for r in eng2.restored_requests}
    for prompt, new in RECOVER_SPECS:
        want = _offline_q8_f32_oracle(prompt, new)
        np.testing.assert_array_equal(got[tuple(prompt)], want,
                                      err_msg=f"request {prompt} diverged")


def test_four_process_serving_session():
    """The refill-broadcast serving design beyond 2 hosts: a 4-process,
    16-device session produces tokens identical to the single-process
    offline decode (primary owns the queue; 3 followers stay in SPMD
    lockstep via the broadcast)."""
    rs = _run_n_process("serve", 4, timeout=600)
    assert len(rs) == 4
    assert len({r["device_steps"] for r in rs}) == 1 and rs[0]["device_steps"] > 0
    assert rs[0]["tokens"] and all(r["tokens"] == {} for r in rs[1:])

    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = gru_textgen.init_params(cfg, jax.random.PRNGKey(7))
    for prompt, new in [([5, 9, 13], 20), ([2], 15), ([11, 3], 18)]:
        ids = np.asarray(prompt, np.int32)[None, :]
        want = np.asarray(
            gru_textgen.generate(
                params, jnp.asarray(ids),
                jnp.asarray([len(prompt)], np.int32), len(prompt) + new,
            )
        )[0]
        np.testing.assert_array_equal(rs[0]["tokens"][str(tuple(prompt))], want)


def test_single_process_degenerates():
    initialize()  # no-op single host
    assert jax.process_count() == 1
    assert is_primary()
    assert host_local_batch_slice(32) == slice(0, 32)
    sync_hosts()  # no-op, must not raise


def test_global_array_from_host_data():
    mesh = make_mesh((2, 4))
    data = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = global_array_from_host_data(mesh, P("data"), data)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), data)
    assert arr.sharding.spec == P("data")
