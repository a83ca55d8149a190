"""Worker process for the REAL 2-process multi-host tests.

Launched by tests/test_multihost.py as ``python multihost_worker.py
<coordinator_port> <process_id> <num_processes> <scenario>``. Each process
owns 4 virtual CPU devices; ``jax.distributed`` wires them into one 8-device
global mesh — the same runtime contract as a real TPU pod (SURVEY.md §5
"Distributed communication backend"), minus ICI.

Scenarios print one JSON line on stdout; the parent asserts the processes
agree with each other and with a single-process oracle.
"""

import json
import os
import sys

# device/platform setup MUST precede the first jax import. The parent pytest
# process exports an 8-device flag (tests/conftest.py) — strip it first.
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(_flags + ["--xla_force_host_platform_device_count=4"])
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize forces axon,cpu

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    port, pid, nproc, scenario = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc
    assert jax.local_device_count() == 4

    from ggml_experiments_tpu.parallel import make_mesh
    from ggml_experiments_tpu.parallel.multihost import sync_hosts

    if scenario in ("tp", "tp_serve"):
        # model axis spans BOTH hosts: TP collectives (column-parallel gate
        # psums, row-parallel head reductions) cross the process boundary
        mesh = make_mesh((1, 4 * nproc))
    else:
        mesh = make_mesh((nproc, 4))  # data spans hosts; model is host-local
    out = {"pid": pid, "scenario": scenario}

    if scenario == "train":
        out.update(run_train(mesh))
    elif scenario == "serve":
        out.update(run_serve(mesh))
    elif scenario == "vision":
        out.update(run_vision(mesh))
    elif scenario == "tp":
        out.update(run_tp(mesh))
    elif scenario == "tp_serve":
        out.update(run_serve(mesh))  # continuous batching, TP across hosts
    elif scenario == "fused_serve":
        out.update(run_fused_serve(mesh))
    elif scenario == "sampled_fused_serve":
        out.update(run_fused_serve(mesh, sampled=True))
    elif scenario == "recover_die":
        return run_recover_die(mesh, pid, out)  # prints + exits itself:
        # the dead-peer phase cannot reach the sync_hosts below
    else:
        raise SystemExit(f"unknown scenario {scenario}")

    sync_hosts()
    print("RESULT " + json.dumps(out), flush=True)


# request specs + param construction shared with the parent's recovery test
# (tests/test_multihost.py imports these to rebuild the oracle and restore
# the snapshot in a fresh single process)
RECOVER_SPECS = [([5, 9, 13], 30), ([2], 26), ([11, 3], 28)]


def recover_qparams():
    """The q8_0 GRU params every recovery phase rebuilds identically."""
    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.quant import quantize

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    fp = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(7))
    )
    return gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray(fp.embeddings),
        cell=type(fp.cell)(
            kernel=quantize(fp.cell.kernel, "q8_0"),
            recurrent_kernel=quantize(fp.cell.recurrent_kernel, "q8_0"),
            bias=jnp.asarray(fp.cell.bias),
        ),
        dense_kernel=quantize(fp.dense_kernel, "q8_0"),
        dense_bias=jnp.asarray(fp.dense_bias),
    )


def run_recover_die(mesh, pid, out):
    """Host-failure recovery, phase 1 (VERDICT r4 #7): a 2-process serving
    session snapshots mid-decode, then host 1 DIES ABRUPTLY (os._exit, no
    shutdown). Host 0 observes its next tick fail or wedge (either way the
    distributed session is over — that is what host death means for an SPMD
    program) and reports. Phase 2 — restoring the snapshot on a FRESH
    single-process session and finishing every in-flight request — runs in
    the parent test, proving the checkpointed request queue tolerates host
    restart end-to-end (SURVEY.md §5 failure-recovery row)."""
    import json as _json
    import threading

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ggml_experiments_tpu.parallel.multihost import is_primary, sync_hosts
    from ggml_experiments_tpu.serving import DecodeEngine

    snap = os.environ["GXT_RECOVER_SNAP"]
    qp = jax.device_put(recover_qparams(), NamedSharding(mesh, P()))
    eng = DecodeEngine(qp, n_slots=2, max_prompt=16, inner_steps=8,
                       compute_dtype=jnp.float32)
    if is_primary():
        for prompt, new in RECOVER_SPECS:
            eng.submit(prompt, new)
    for _ in range(2):          # mid-decode: slots busy, one request queued
        eng._tick()
    if is_primary():
        eng.snapshot(snap)
    out["snapshot_written"] = os.path.exists(snap)
    out["pos_after_2_ticks"] = [int(v) for v in np.asarray(eng.state.pos)]
    sync_hosts()                # snapshot durable before anyone dies

    if pid == 1:
        os._exit(17)            # abrupt host death: no shutdown, no barrier

    # host 0: the next SPMD tick must not succeed silently without the peer
    status = {"done": False, "error": None}

    def _try_tick():
        try:
            eng._tick()
            status["done"] = True
        except Exception as ex:  # noqa: BLE001
            status["error"] = f"{type(ex).__name__}: {ex}"[:200]
            status["done"] = True

    t = threading.Thread(target=_try_tick, daemon=True)
    t.start()
    t.join(timeout=25)
    out["peer_death"] = (
        "error" if status["error"] else
        ("wedged" if not status["done"] else "tick_succeeded")
    )
    out["peer_death_detail"] = status["error"]
    print("RESULT " + _json.dumps(out), flush=True)
    os._exit(0)                 # the distributed runtime is unusable now


def run_train(mesh):
    """DP+TP train steps over the global mesh: every host feeds its own batch
    shard; losses/params are identical everywhere (SPMD lockstep)."""
    import optax
    from jax.sharding import PartitionSpec as P

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.parallel.multihost import (
        global_array_from_host_data, host_local_batch_slice,
    )
    from ggml_experiments_tpu.parallel.sharding import gru_param_specs, place
    from ggml_experiments_tpu.training.gru_trainer import make_train_step

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(0))
    )
    params = place(params, gru_param_specs(params), mesh)

    opt = optax.adam(1e-3)
    opt_state = jax.jit(opt.init)(params)
    step = make_train_step(opt, mesh)

    rng = np.random.default_rng(42)
    global_batch, seq = 16, 24
    losses = []
    for i in range(3):
        # identical global data on every host; each host feeds only its slice
        inputs = rng.integers(0, 66, (global_batch, seq)).astype(np.int32)
        targets = np.roll(inputs, -1, axis=1)
        sl = host_local_batch_slice(global_batch)
        gi = global_array_from_host_data(mesh, P("data"), inputs[sl])
        gt = global_array_from_host_data(mesh, P("data"), targets[sl])
        params, opt_state, loss = step(params, opt_state, gi, gt)
        losses.append(float(loss))

    checksum = float(
        jax.jit(
            lambda p: sum(jax.numpy.sum(jax.numpy.abs(x))
                          for x in jax.tree_util.tree_leaves(p))
        )(params)
    )
    return {"losses": losses, "checksum": checksum}


def run_serve(mesh):
    """Continuous-batching session over the global mesh with the refill
    broadcast: the primary host owns the queue; follower hosts execute the
    identical _reset/_scan SPMD programs (serving/engine.py multi-host
    design). Returns every request's tokens for parity checks."""
    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.parallel.multihost import is_primary
    from ggml_experiments_tpu.parallel.sharding import gru_param_specs, place
    from ggml_experiments_tpu.serving import DecodeEngine

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(7))
    )
    placed = place(params, gru_param_specs(params), mesh)

    eng = DecodeEngine(placed, n_slots=2, max_prompt=16, inner_steps=4)
    specs = [([5, 9, 13], 20), ([2], 15), ([11, 3], 18)]  # 3 requests, 2 slots
    handles = []
    if is_primary():
        for prompt, new in specs:
            handles.append(eng.submit(prompt, new))
    # every host drives the engine loop; follower queues are empty and get
    # the primary's refill decisions via the broadcast
    eng.run_until_idle(timeout_s=300)
    results = {}
    if is_primary():
        for (prompt, new), h in zip(specs, handles):
            results[str(tuple(prompt))] = [int(t) for t in h.result(timeout=5)]
    return {"tokens": results, "device_steps": eng.stats.device_steps}


def run_fused_serve(mesh, sampled=False):
    """Continuous batching across processes THROUGH THE FUSED TICK KERNEL
    (VERDICT r2 #5): quantized params replicated on the global mesh, the
    engine routes ticks through ops/fused_gru_decode.fused_slot_tick with
    its slot axis sharded over 'data' (each process's devices tick only
    their local slots; outputs all-gather back). Interpret mode on CPU;
    tokens must match the single-process offline decode exactly.

    ``sampled=True`` builds a sampling-enabled engine (VERDICT r3: sampled
    multi-process serving no longer falls back to the scan tick — each slot
    shard mixes its global slot offset into the in-kernel PRNG seed): a
    temp=0 request stays token-exact vs the oracle, identical sampled
    requests decorrelate, and a state digest checks every process computed
    the SAME replicated sample streams (SPMD divergence would split them)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.parallel.multihost import is_primary
    from ggml_experiments_tpu.quant import quantize
    from ggml_experiments_tpu.serving import DecodeEngine

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
    qp = jax.device_put(qp, NamedSharding(mesh, P()))

    # f32 compute: token-exact vs the single-process f32 scan oracle
    eng = DecodeEngine(qp, n_slots=4, max_prompt=16, inner_steps=8,
                       compute_dtype=jnp.float32, use_fused_tick=True,
                       enable_sampling=sampled, seed=11)
    if sampled:
        # temps: one greedy exactness anchor + two identical sampled prompts
        specs = [([5, 9, 13], 20, 0.0), ([2, 4], 15, 1.0), ([2, 4], 15, 1.0)]
    else:
        specs = [([5, 9, 13], 20, 0.0), ([2], 15, 0.0), ([11, 3], 18, 0.0)]
    handles = []
    if is_primary():
        for prompt, new, temp in specs:
            handles.append(
                eng.submit(prompt, new, temperature=temp) if sampled
                else eng.submit(prompt, new)
            )
    eng.run_until_idle(timeout_s=300)
    results = {}
    if is_primary():
        for i, ((prompt, new, _t), h) in enumerate(zip(specs, handles)):
            results[f"{i}:{tuple(prompt)}"] = [int(t) for t in h.result(timeout=5)]
    # replicated device state digest: every process must have advanced the
    # SAME streams (sampled SPMD divergence would split prev/h across hosts)
    digest = int(np.asarray(eng.state.prev).sum()) + int(
        np.round(float(np.abs(np.asarray(eng.state.h)).sum()) * 1e3)
    )
    return {
        "tokens": results,
        "device_steps": eng.stats.device_steps,
        "fused": eng.use_fused_tick,
        "slot_axis": eng._fused_slot_axis,
        "state_digest": digest,
    }


def run_tp(mesh):
    """Train steps on a (1, 8) mesh — every TP collective is cross-host.
    The batch is replicated (each host feeds the identical full batch);
    losses/params must be bit-identical on both hosts and match the
    single-process oracle."""
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.parallel.sharding import gru_param_specs, place
    from ggml_experiments_tpu.training.gru_trainer import make_train_step

    cfg = GRUConfig(vocab_size=66, embed_dim=16, units=32)
    params = jax.tree_util.tree_map(
        np.asarray, gru_textgen.init_params(cfg, jax.random.PRNGKey(5))
    )
    params = place(params, gru_param_specs(params), mesh)
    opt = optax.adam(1e-3)
    opt_state = jax.jit(opt.init)(params)
    step = make_train_step(opt, mesh)

    rng = np.random.default_rng(77)
    losses = []
    repl = NamedSharding(mesh, P("data"))  # data axis size 1 -> replicated
    for _ in range(3):
        inputs = rng.integers(0, 66, (8, 16)).astype(np.int32)
        targets = np.roll(inputs, -1, axis=1)
        gi = jax.make_array_from_process_local_data(repl, inputs, inputs.shape)
        gt = jax.make_array_from_process_local_data(repl, targets, targets.shape)
        params, opt_state, loss = step(params, opt_state, gi, gt)
        losses.append(float(loss))
    checksum = float(
        jax.jit(
            lambda p: sum(jnp.sum(jnp.abs(x))
                          for x in jax.tree_util.tree_leaves(p))
        )(params)
    )
    return {"losses": losses, "checksum": checksum}


def run_vision(mesh):
    """DP MobileViT forward across hosts THROUGH the fused whole-layer
    kernel (interpret mode on CPU): each host feeds its local batch slice;
    the fused kernel's custom_partitioning rule must keep shards local and
    every host must see identical global features."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
    )
    from ggml_experiments_tpu.parallel.multihost import (
        global_array_from_host_data, host_local_batch_slice,
    )

    cfg = MobileViTConfig(
        image_size=64, hidden_sizes=(16, 24, 32),
        neck_hidden_sizes=(8, 16, 16, 24, 32, 40, 64),
        num_transformer_layers=(1, 1, 1),
    )
    params = from_named_tensors(
        random_named_tensors(cfg, seed=3), cfg, flash_attn=False, fused_layer=True
    )
    rng = np.random.default_rng(9)
    imgs = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
    gi = global_array_from_host_data(mesh, P("data"), imgs[host_local_batch_slice(8)])
    feats = jax.jit(extract_features, static_argnames=("compute_dtype",))(
        params, gi, compute_dtype=jnp.bfloat16
    )
    # gather the global result on every host for the parity check
    full = np.asarray(
        jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))(feats),
        np.float32,
    )
    return {
        "checksum": float(np.abs(full).sum()),
        "first": [float(v) for v in full[0, 0, 0, :4]],
    }


if __name__ == "__main__":
    main()
