"""At-scale soak of the continuous-batching vision engine (VERDICT r4 #5).

Measures, on the full-size trained checkpoint on the real chip:

1. the OFFLINE ceiling — jitted classify at B=128 on a device-resident
   batch (the headline img/s protocol);
2. the engine E2E — mixed-arrival classify requests (bursts of 1..128,
   u8 transport) with live cancels, through submit -> collate -> dispatch
   -> readback -> distribute; reported as img/s and as a fraction of (1),
   with the per-phase wall breakdown.

Usage:  python tools/vision_serving_soak.py [--images 4096] [--f32-transport]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


LADDER = (8, 32, 128, 512, 1024)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=4096)
    ap.add_argument("--weights", default="checkpoints/mobilevit_synth_full.ggml")
    ap.add_argument("--f32-transport", action="store_true",
                    help="ship f32 images (4x the link bytes; the honest "
                         "ablation for the u8-transport claim)")
    ap.add_argument("--cancels", type=int, default=64)
    ap.add_argument("--device-resident", action="store_true",
                    help="exclude the input link: requests carry 32px stubs "
                         "while the compute runs on pre-staged 256px device "
                         "batches — measures the engine machinery + compute "
                         "+ result readback at scale (the dev tunnel's "
                         "~30 MB/s input link otherwise bounds e2e at "
                         "~0.2 MB/img, absent on direct-attached hosts)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/ggml_experiments_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ggml_experiments_tpu.models.mobilevit import classify, load_mobilevit
    from ggml_experiments_tpu.serving.vision import VisionEngine
    from ggml_experiments_tpu.training.image_task import FULL_AMP_FACTOR, make_dataset
    from ggml_experiments_tpu.utils.benchmarking import timeit_stats

    params = load_mobilevit(args.weights, qtype="q8_0")
    size = 256

    # --- offline ceiling: device-resident B=128, pinned protocol ----------
    x128 = jnp.asarray(
        make_dataset(128, seed=3, image_size=size, amp_factor=FULL_AMP_FACTOR)[0]
    )
    fn = jax.jit(classify, static_argnames=("compute_dtype",))
    st = timeit_stats(lambda: fn(params, x128, compute_dtype=jnp.bfloat16))
    offline = 128 / st.headline
    print(f"offline B=128 (device-resident): {st.headline*1e3:.2f} ms/call "
          f"-> {offline:,.0f} img/s (spread {st.spread:.3f})", flush=True)

    # --- engine soak -------------------------------------------------------
    transport = "f32" if args.f32_transport else "u8"
    pool_f = make_dataset(512, seed=9, image_size=size,
                          amp_factor=FULL_AMP_FACTOR)[0]
    if transport == "u8":
        pool = np.clip((pool_f - pool_f.min()) /
                       max(float(np.ptp(pool_f)), 1e-6) * 255.0,
                       0, 255).astype(np.uint8)
    else:
        pool = np.asarray(pool_f, np.float32)

    if args.device_resident:
        # requests carry 3KB stubs; each ladder size computes on a staged
        # full-resolution device batch through the SAME jitted forward
        eng = VisionEngine(params, image_size=32, batch_sizes=tuple(LADDER),
                           compute_dtype=jnp.bfloat16, transport=transport,
                           pipeline_depth=4, max_pending=100_000)
        staged = {b: jax.device_put(jnp.asarray(
            np.concatenate([pool if transport == "u8" else pool_f] * 4)[:b]))
            for b in LADDER}
        inner = jax.jit(classify, static_argnames=("compute_dtype",))

        def fn_staged(p, xu8, *, compute_dtype):
            xb = staged[xu8.shape[0]]
            if transport == "u8":
                xb = xb.astype(jnp.float32) / 255.0
            return inner(p, xb, compute_dtype=compute_dtype)

        eng._fns["classify"] = jax.jit(
            fn_staged, static_argnames=("compute_dtype",))
        pool = pool[:, :32, :32] if transport == "u8" else pool_f[:, :32, :32]
        pool = np.ascontiguousarray(pool)
    else:
        eng = VisionEngine(params, image_size=size, batch_sizes=tuple(LADDER),
                           compute_dtype=jnp.bfloat16, transport=transport,
                           pipeline_depth=4, max_pending=100_000)
    # warm every ladder rung deterministically: submit exactly one full
    # rung with the worker STOPPED (one collate = one compile), then drain
    for b in LADDER:
        warm = [eng.submit(pool[i % len(pool)]) for i in range(b)]
        eng.start()
        for r in warm:
            r.result(timeout=1800)
        eng.stop()
    eng.start()
    eng.stats.__init__()

    rng = np.random.default_rng(0)
    reqs = []
    canceled = 0
    t0 = time.perf_counter()
    submitted = 0
    while submitted < args.images:
        burst = int(rng.integers(1, 129))
        burst = min(burst, args.images - submitted)
        for _ in range(burst):
            reqs.append(eng.submit(pool[submitted % 512]))
            submitted += 1
        if canceled < args.cancels and rng.random() < 0.3:
            victim = reqs[int(rng.integers(max(0, len(reqs) - 256), len(reqs)))]
            if not victim.done:
                victim.cancel()
                canceled += 1
    eng.run_until_idle(timeout=1800)
    wall = time.perf_counter() - t0
    eng.stop()

    done = sum(1 for r in reqs if r.done and not r._canceled and r._error is None)
    e2e = done / wall
    print(f"soak: {submitted} submitted, {done} completed, "
          f"{canceled} canceled, {wall:.2f}s wall "
          f"-> {e2e:,.0f} img/s e2e = {e2e/offline:.1%} of offline", flush=True)
    print("breakdown:", eng.stats.breakdown(), flush=True)
    print(f"engine errors: {eng.error!r}")
    import json

    print(json.dumps({
        "transport": transport, "offline_img_s": round(offline, 1),
        "e2e_img_s": round(e2e, 1), "fraction_of_offline": round(e2e/offline, 4),
        "breakdown": eng.stats.breakdown(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
