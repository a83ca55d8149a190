"""Command-line drivers — the reference's L4 `./main` binaries, framework-native.

  python -m ggml_experiments_tpu generate  --weights gru.bin [--prompt "..."]
  python -m ggml_experiments_tpu features  --weights weight.ggml [--image img.jpg]
  python -m ggml_experiments_tpu classify  --weights weight.ggml --image img.jpg
  python -m ggml_experiments_tpu quantize  --input gru.bin --output gru.q8.gxt
  python -m ggml_experiments_tpu train-gru --corpus text.txt --output gru.bin

Unlike the reference (no argv parsing, hardcoded paths/sizes — SURVEY.md §5
"Config / flag system"), everything is a flag. ``generate`` with no --prompt
reads one line from stdin, mirroring rnn_text_generation.cpp:325-328.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_common(p):
    from ggml_experiments_tpu.quant.qtensor import QTYPES

    p.add_argument("--qtype", choices=list(QTYPES), default=None,
                   help="block-quantize matmul weights on load")
    p.add_argument("--compute", choices=["float32", "bfloat16"], default="float32",
                   help="MXU compute precision (float32 = full passes)")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu) before first use")
    p.add_argument("--compile-cache", default="auto",
                   help="persistent XLA compile-cache dir; 'auto' (default) "
                        "uses ~/.cache/ggml_experiments_tpu/jax, 'off' "
                        "disables. Large fused serving kernels cold-compile "
                        "in minutes on remote-compile backends; the cache "
                        "makes every later engine start take seconds")


def _setup(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = getattr(args, "compile_cache", "auto")
    if cache != "off":
        if cache == "auto":
            cache = os.path.join(os.path.expanduser("~"), ".cache",
                                 "ggml_experiments_tpu", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    return jnp.float32 if args.compute == "float32" else jnp.bfloat16


def cmd_generate(args) -> int:
    compute_dtype = _setup(args)
    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.formats.gru_bin import load_gru_any
    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

    params = load_gru_any(args.weights, qtype=args.qtype)
    tok = CharTokenizer()
    prompts = args.prompt
    if not prompts:
        print("type: ", flush=True)
        prompts = [sys.stdin.readline().rstrip("\n")[:50]]
    ids, lengths = tok.encode_batch(prompts)
    t0 = time.time()
    out = gru_textgen.generate(
        params,
        jnp.asarray(ids),
        jnp.asarray(lengths),
        args.steps,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        rng=jax.random.PRNGKey(args.seed),
        compute_dtype=compute_dtype,
    )
    out = out.block_until_ready()
    dt = time.time() - t0
    for row in out:
        print(tok.decode(int(t) for t in row))
        print("--------")
    print(
        f"[{len(prompts)}x{args.steps} tokens in {dt:.2f}s = "
        f"{len(prompts) * args.steps / dt:,.0f} tokens/s]",
        file=sys.stderr,
    )
    return 0


def _load_image(args, size: int):
    import numpy as np

    from ggml_experiments_tpu.utils.image import load_and_preprocess, synthetic_test_image

    if args.image:
        return load_and_preprocess(args.image, size=size)
    return synthetic_test_image(size)


def cmd_features(args) -> int:
    compute_dtype = _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.models.mobilevit import (
        extract_features, from_named_tensors, infer_config, load_mobilevit,
    )

    if args.weights.endswith(".gxt"):
        # calibrated-quantized params checkpoint (self-describing meta)
        from ggml_experiments_tpu.formats import checkpoint as _ckpt

        params = load_mobilevit(
            args.weights, flash_attn=args.flash_attn,
            fused_layer=getattr(args, "fused_layer", None),
            act_storage=getattr(args, "act_storage", None),
            act_storage_scope=getattr(args, "act_storage_scope", "early"),
        )
        size = _ckpt.read_meta(args.weights).get("config", {}).get(
            "image_size", args.image_size)
        img = _load_image(args, size)
    else:
        # architecture comes off the weight shapes (the reference instead
        # hardcodes hparams, main.cpp:35-53): reduced/resized exports just work
        named = read_named_tensors(args.weights)
        config = infer_config(named, image_size=args.image_size,
                              num_attention_heads=args.num_heads)
        params = from_named_tensors(
            named, config, qtype=args.qtype,
            conv_dtype="float16" if args.f16_convs else None,
            flash_attn=args.flash_attn,
            fused_layer=getattr(args, "fused_layer", None),
            act_storage=getattr(args, "act_storage", None),
            act_storage_scope=getattr(args, "act_storage_scope", "early"),
        )
        img = _load_image(args, config.image_size)
    t0 = time.time()
    # jit the whole forward: on the tunneled TPU backend an eager (op-by-op)
    # forward pays a remote compile+dispatch per op — minutes instead of ms
    feat_fn = jax.jit(extract_features, static_argnames=("compute_dtype",))
    feats = np.asarray(
        feat_fn(params, jnp.asarray(img)[None], compute_dtype=compute_dtype)
    )
    print(f"forward: {(time.time() - t0) * 1000:.1f} ms", file=sys.stderr)
    # reference-comparable printout (print_features_d2, main.cpp:1225-1244):
    # shape in ggml ne-order (W, H, C) and first/last 5 channels at (0, 0)
    b, h, w, c = feats.shape
    print(f"output feature shape: : Dims: ({w}, {h}, {c})")
    vec = feats[0, 0, 0]
    head = ", ".join(f"{v:g}" for v in vec[:5])
    tail = ", ".join(f"{v:g}" for v in vec[-5:])
    print("features of the test image: ")
    print(f"i0 = 0, i1 = 0\n{head}, ...{tail},")
    return 0


def cmd_classify(args) -> int:
    compute_dtype = _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.models.mobilevit import (
        classify, from_named_tensors, infer_config, load_mobilevit,
    )

    if args.weights.endswith(".gxt"):
        from ggml_experiments_tpu.formats import checkpoint as _ckpt

        params = load_mobilevit(
            args.weights, flash_attn=getattr(args, "flash_attn", None),
            fused_layer=getattr(args, "fused_layer", None),
            act_storage=getattr(args, "act_storage", None),
            act_storage_scope=getattr(args, "act_storage_scope", "early"),
        )
        size = _ckpt.read_meta(args.weights).get("config", {}).get(
            "image_size", getattr(args, "image_size", 256))
        img = _load_image(args, size)
    else:
        named = read_named_tensors(args.weights)
        config = infer_config(named, image_size=getattr(args, "image_size", 256),
                              num_attention_heads=getattr(args, "num_heads", 4))
        params = from_named_tensors(
            named, config, qtype=args.qtype,
            flash_attn=getattr(args, "flash_attn", None),
            fused_layer=getattr(args, "fused_layer", None),
            act_storage=getattr(args, "act_storage", None),
            act_storage_scope=getattr(args, "act_storage_scope", "early"),
        )
        img = _load_image(args, config.image_size)
    cls_fn = jax.jit(classify, static_argnames=("compute_dtype",))
    logits = np.asarray(
        cls_fn(params, jnp.asarray(img)[None], compute_dtype=compute_dtype)
    )[0]
    top = np.argsort(logits)[::-1][: args.top_k]
    for i in top:
        print(f"class {int(i)}: logit {logits[i]:.4f}")
    return 0


def _calibration_images(source: str, image_size: int, n: int):
    """Calibration images for vision quantization: a directory of image
    files, or 'task'[:seed] for the in-repo synthetic task distribution
    (the right distribution for the in-repo trained checkpoints)."""
    import numpy as np

    if source.startswith("task"):
        from ggml_experiments_tpu.training.image_task import (
            FULL_AMP_FACTOR, make_dataset,
        )

        seed = int(source.split(":", 1)[1]) if ":" in source else 1234
        amp = FULL_AMP_FACTOR if image_size >= 256 else 1.0
        x, _ = make_dataset(n, seed=seed, image_size=image_size, amp_factor=amp)
        return x
    if os.path.isdir(source):
        from ggml_experiments_tpu.utils.image import load_and_preprocess

        files = sorted(
            os.path.join(source, f) for f in os.listdir(source)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".ppm",
                                   ".tga", ".gif"))
        )[:n]
        if not files:
            raise ValueError(f"no images found in {source}")
        return np.stack([load_and_preprocess(f, image_size) for f in files])
    raise ValueError(f"--calibrate {source!r}: not a directory or 'task[:seed]'")


def cmd_quantize(args) -> int:
    _setup(args)
    import numpy as np

    from ggml_experiments_tpu.formats import checkpoint
    from ggml_experiments_tpu.formats.gru_bin import load_gru_params

    qtype = args.qtype or "q8_0"
    if qtype == "q4_k_m" or args.calibrate:
        # calibrated recipe (quant/calibration.py): GPTQ-compensated q4_k on
        # the bulk weights + q8_0 on the logits-producing head. GRU inputs
        # calibrate on text, MobileViT inputs on images.
        if not args.calibrate:
            print("--qtype q4_k_m needs --calibrate (GRU: a text corpus; "
                  "MobileViT: an image directory or 'task' for the in-repo "
                  "synthetic task)", file=sys.stderr)
            return 2
        from ggml_experiments_tpu.quant import calibration

        if args.input.endswith(".bin"):
            from ggml_experiments_tpu.training.data import (
                DataConfig, load_corpus, make_examples,
            )
            from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

            base = load_gru_params(args.input)
            ex = make_examples(load_corpus(args.calibrate), CharTokenizer(),
                               DataConfig(seq_length=100))
            sel = np.random.default_rng(0).permutation(len(ex))[: args.calibrate_seqs]
            if qtype == "q4_k_m":
                tree = calibration.gptq_gru_params(base, ex[sel])
            else:
                tree = calibration.calibrated_gru_params(base, ex[sel], qtype=qtype)
            meta = {"kind": "gru", "qtype": qtype, "calibrated": True}
            qts = [tree.cell.kernel, tree.cell.recurrent_kernel, tree.dense_kernel]
        else:
            import dataclasses as _dc

            from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
            from ggml_experiments_tpu.models.mobilevit import (
                from_named_tensors, infer_config,
            )

            named = read_named_tensors(args.input)
            cfg = infer_config(named)
            images = _calibration_images(args.calibrate, cfg.image_size,
                                         args.calibrate_seqs)
            # Grams come off the unfused float forward (the taps live in
            # ops/linear); the saved tree is a plain params pytree that
            # load_mobilevit re-loads under any runtime flags
            pf = from_named_tensors(named, cfg, qtype=None,
                                    flash_attn=False, fused_layer=False)
            grams = calibration.collect_mobilevit_grams(pf, images)
            tree = calibration.gptq_mobilevit_params(
                from_named_tensors(named, cfg, qtype=None,
                                   flash_attn=False, fused_layer=False),
                grams,
            )
            meta = {"kind": "mobilevit", "qtype": qtype, "calibrated": True,
                    "config": _dc.asdict(cfg),
                    "classifier": tree.classifier_kernel is not None}
            qts = [qt for _, holder, field in calibration._vision_quantizable(tree)
                   for qt in [getattr(holder, field)]]
        checkpoint.save(args.output, tree, meta=meta)
        n_weights = sum(t.shape[0] * t.shape[1] for t in qts)
        bits_stored = 8.0 * sum(t.stored_nbytes for t in qts) / n_weights
        bits_hbm = 8.0 * sum(t.nbytes for t in qts) / n_weights
        ratio = os.path.getsize(args.input) / os.path.getsize(args.output)
        print(json.dumps({
            "input": args.input, "output": args.output, "qtype": qtype,
            "calibrated": True, "bits_per_weight": round(bits_stored, 3),
            "bits_per_weight_hbm": round(bits_hbm, 3),
            "compression_vs_input": round(ratio, 2),
        }))
        return 0
    if args.input.endswith(".bin"):
        tree = load_gru_params(args.input, qtype=qtype)
    else:
        from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
        from ggml_experiments_tpu.models.mobilevit import from_named_tensors, infer_config

        named = read_named_tensors(args.input)
        tree = from_named_tensors(named, infer_config(named), qtype=qtype)
    checkpoint.save(args.output, tree)
    ratio = os.path.getsize(args.input) / os.path.getsize(args.output)
    print(json.dumps({
        "input": args.input, "output": args.output, "qtype": qtype,
        "compression_vs_input": round(ratio, 2),
    }))
    return 0


def cmd_train_gru(args) -> int:
    compute_dtype = _setup(args)
    from ggml_experiments_tpu.formats.gru_bin import save_gru_params
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.training import TrainConfig, train_from_text
    from ggml_experiments_tpu.training.data import DataConfig, load_corpus

    text = load_corpus(args.corpus)
    params, history, tok = train_from_text(
        text,
        model_config=GRUConfig(embed_dim=args.embed_dim, units=args.units),
        train_config=TrainConfig(
            epochs=args.epochs, checkpoint_path=args.checkpoint,
            log_every=args.log_every, eval_every=args.eval_every,
            compute_dtype=compute_dtype,
            resume_path=args.resume, save_every=args.save_every,
        ),
        data_config=DataConfig(seq_length=args.seq_length, batch_size=args.batch_size),
        seed=args.seed,
        eval_text=load_corpus(args.eval_corpus) if args.eval_corpus else None,
    )
    if args.output:
        save_gru_params(args.output, params)
        print(f"exported weights to {args.output} (reference gru.bin format)")
    if history:
        summary = {"final_loss": history[-1]["loss"], "steps": history[-1]["step"]}
        val = [h["val_ppl"] for h in history if "val_ppl" in h]
        if val:
            summary["final_val_ppl"] = val[-1]
    else:  # resumed past the end of the stream: a completed run is a no-op
        summary = {"resumed_complete": True}
    print(json.dumps(summary))
    return 0


def cmd_serve(args) -> int:
    """Interactive continuous-batching service: prompts on stdin, one per line
    (the reference's `cin.getline` loop, .cpp:325-328, made a real service)."""
    compute_dtype = _setup(args)
    from ggml_experiments_tpu.formats.gru_bin import load_gru_any
    from ggml_experiments_tpu.serving import DecodeEngine
    from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

    params = load_gru_any(args.weights, qtype=args.qtype)
    tok = CharTokenizer()
    engine = DecodeEngine(
        params, n_slots=args.slots, max_prompt=args.max_prompt,
        inner_steps=args.inner_steps, compute_dtype=compute_dtype,
        temperature=args.temperature,
        fetch_depth=args.fetch_depth, fetch_async=args.fetch_async,
    )
    engine.start()
    if args.http is not None:
        import signal

        from ggml_experiments_tpu.serving.http import HttpFrontend

        front = HttpFrontend(engine, tok, host=args.host, port=args.http)
        front.start()
        print(f"serving HTTP on {args.host}:{front.port} "
              f"({args.slots} slots; POST /v1/generate, GET /v1/health)",
              file=sys.stderr)
        try:
            if hasattr(signal, "pause"):
                signal.pause()
            else:  # non-POSIX: block forever (Ctrl-C raises out of wait)
                import threading

                threading.Event().wait()
        except KeyboardInterrupt:
            pass
        finally:
            front.stop()
            engine.stop()
        return 0
    print(f"serving with {args.slots} slots; type a prompt per line "
          f"(empty line or EOF to quit)", file=sys.stderr)
    try:
        while True:
            line = sys.stdin.readline()
            if not line or not line.strip("\n"):
                break
            req = engine.submit(
                tok.encode(line.rstrip("\n")[: args.max_prompt]),
                args.steps,
                on_token=lambda t: print(tok.decode([t]), end="", flush=True),
            )
            req.result(timeout=600)  # tokens already streamed above
            print("\n--------")
        s = engine.stats
        print(
            f"[{s.requests_completed} requests, {s.tokens_generated} tokens, "
            f"{s.tokens_per_s:,.0f} tokens/s device]",
            file=sys.stderr,
        )
    finally:
        engine.stop()
    return 0


def cmd_serve_vision(args) -> int:
    """Continuous-batching image service over HTTP — the reference's
    single-image mobilevit main() (main.cpp:649-706) as a production
    endpoint (classify + features)."""
    compute_dtype = _setup(args)
    import signal

    from ggml_experiments_tpu.formats import checkpoint as _ckpt
    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.serving.http import HttpFrontend
    from ggml_experiments_tpu.serving.vision import VisionEngine

    params = load_mobilevit(args.weights, qtype=args.qtype) \
        if not args.weights.endswith(".gxt") else load_mobilevit(args.weights)
    if args.weights.endswith(".gxt"):
        size = _ckpt.read_meta(args.weights).get("config", {}).get(
            "image_size", args.image_size)
    else:
        size = args.image_size
    eng = VisionEngine(
        params, image_size=size,
        batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")),
        compute_dtype=compute_dtype,
    )
    eng.start()
    front = HttpFrontend(None, vision=eng, host=args.host, port=args.http)
    front.start()
    print(f"vision service on {args.host}:{front.port} "
          f"(POST /v1/classify, /v1/features; GET /v1/vision/stats)",
          file=sys.stderr)
    try:
        if hasattr(signal, "pause"):
            signal.pause()
        else:  # pragma: no cover - non-POSIX
            import threading

            threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        front.stop()
        eng.stop()
    return 0


def cmd_eval(args) -> int:
    """Quantization-delta report: quantized vs fp32 on the same weights."""
    _setup(args)
    import numpy as np

    from ggml_experiments_tpu import evaluation

    qtype = args.qtype or "q8_0"
    rng = np.random.default_rng(args.seed)
    if args.weights.endswith(".gxt"):
        from ggml_experiments_tpu.formats import checkpoint as _ckpt

        kind = _ckpt.read_meta(args.weights).get("kind")
        if kind == "mobilevit":
            print("eval compares quantized vs fp32 of the SAME weights; a "
                  "quantized-only .gxt has no fp32 twin — run eval on the "
                  "original weight.ggml instead", file=sys.stderr)
            return 2
    if args.weights.endswith((".bin", ".gxt")):
        from ggml_experiments_tpu.formats.gru_bin import load_gru_any

        ref = load_gru_any(args.weights)
        q = load_gru_any(args.weights, qtype=qtype)
        v = ref.embeddings.shape[0]
        if getattr(args, "corpus", None):
            # held-out text: Δtop-1/Δppl on REAL next-token distributions
            # (the BASELINE contract is only meaningful on trained weights)
            from ggml_experiments_tpu.training.data import DataConfig, load_corpus, make_examples
            from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

            ex = make_examples(load_corpus(args.corpus), CharTokenizer(),
                               DataConfig(seq_length=args.length))
            seqs = ex[rng.permutation(len(ex))[: args.batch]]
        else:
            seqs = rng.integers(0, v, (args.batch, args.length + 1)).astype(np.int32)
        rep = evaluation.eval_gru_delta(ref, q, seqs)
    else:
        from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
        from ggml_experiments_tpu.models.mobilevit import from_named_tensors, infer_config
        from ggml_experiments_tpu.utils.image import synthetic_test_image

        tensors = read_named_tensors(args.weights)
        config = infer_config(tensors, image_size=getattr(args, "image_size", 256),
                              num_attention_heads=getattr(args, "num_heads", 4))
        ref = from_named_tensors(tensors, config)
        q = from_named_tensors(tensors, config, qtype=qtype)
        imgs = np.stack([synthetic_test_image(config.image_size)] * args.batch)
        rep = evaluation.eval_mobilevit_delta(ref, q, imgs)
        extra = {}
        if ref.classifier_kernel is not None:
            # checkpoint carries a head: report the classification-level
            # contract too — q-vs-fp32 top-1 agreement on the deterministic
            # grating set, plus accuracy when the head IS the in-repo
            # synthetic-task one (label space matches)
            from ggml_experiments_tpu.training.image_task import (
                HELDOUT_SEED, NUM_CLASSES, make_dataset, top1,
            )

            n = max(args.batch, 64)
            test_x, test_y = make_dataset(n, seed=HELDOUT_SEED,
                                          image_size=config.image_size)
            pr = top1(ref, test_x)
            pq = top1(q, test_x)
            extra["top1_agreement"] = float((pr == pq).mean())
            if config.num_labels == NUM_CLASSES:
                extra["top1_f32"] = float((pr == test_y).mean())
                extra["top1_q"] = float((pq == test_y).mean())
                extra["dtop1"] = extra["top1_f32"] - extra["top1_q"]
        print(json.dumps({"qtype": qtype, **rep.as_dict(), **extra}))
        return 0
    print(json.dumps({"qtype": qtype, **rep.as_dict()}))
    return 0


def cmd_aot_export(args) -> int:
    """Freeze a shape-specialized program into a deployable .gxa artifact
    (StableHLO via jax.export) — the framework's counterpart of shipping the
    reference's compiled ./main binary."""
    _setup(args)
    from ggml_experiments_tpu.serving import aot

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    if args.model == "gru":
        from ggml_experiments_tpu.formats.gru_bin import load_gru_any

        params = load_gru_any(args.weights, qtype=args.qtype)
        aot.export_gru_decode(
            params, batch=args.batch, prompt_len=args.prompt_len,
            total_steps=args.steps, path=args.output, platforms=platforms,
            qtype=args.qtype,
        )
    else:
        from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
        from ggml_experiments_tpu.models.mobilevit import from_named_tensors, infer_config

        named = read_named_tensors(args.weights)
        config = infer_config(named, image_size=args.image_size)
        params = from_named_tensors(named, config, qtype=args.qtype)
        aot.export_mobilevit_features(
            params, batch=args.batch, image_size=config.image_size,
            path=args.output, platforms=platforms, qtype=args.qtype,
        )
    meta, _ = aot.load_artifact(args.output)
    print(json.dumps({"output": args.output, **meta}))
    return 0


def cmd_aot_run(args) -> int:
    """Run an exported .gxa artifact against a weight file — the deployment
    path: no model code is traced, the program is the one frozen at export."""
    _setup(args)
    import numpy as np
    import jax.numpy as jnp

    from ggml_experiments_tpu.serving import aot

    meta, exp = aot.load_artifact(args.artifact)
    # The artifact records the qtype its params pytree was frozen with; use it
    # as the default and reject a mismatch up front (a wrong qtype otherwise
    # dies deep inside exp.call with an opaque pytree/shape error).
    export_qtype = meta.get("qtype")
    if args.qtype is None:
        args.qtype = export_qtype
    elif "qtype" in meta and args.qtype != export_qtype:
        raise SystemExit(
            f"--qtype {args.qtype} does not match the artifact's export qtype "
            f"{export_qtype!r}; the frozen program only accepts params of the "
            f"export-time pytree structure"
        )
    if meta["kind"] == "gru-decode":
        from ggml_experiments_tpu.formats.gru_bin import load_gru_any
        from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

        params = load_gru_any(args.weights, qtype=args.qtype)
        tok = CharTokenizer()
        ids = tok.encode(args.prompt or "ROMEO:")[: meta["prompt_len"]]
        b, p = meta["batch"], meta["prompt_len"]
        prompt = np.zeros((b, p), np.int32)
        prompt[:, : len(ids)] = ids
        lengths = np.full((b,), len(ids), np.int32)
        toks = np.asarray(exp.call(params, jnp.asarray(prompt), jnp.asarray(lengths)))
        print(tok.decode(toks[0]))
    elif meta["kind"] == "mobilevit-features":
        from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
        from ggml_experiments_tpu.models.mobilevit import from_named_tensors, infer_config

        named = read_named_tensors(args.weights)
        config = infer_config(named, image_size=meta["image_size"])
        params = from_named_tensors(named, config, qtype=args.qtype)
        img = _load_image(args, meta["image_size"])
        images = jnp.asarray(np.stack([img] * meta["batch"]))
        feats = np.asarray(exp.call(params, images))
        b, h, w, c = feats.shape
        print(f"output feature shape: : Dims: ({w}, {h}, {c})")
        vec = feats[0, 0, 0]
        head = ", ".join(f"{v:g}" for v in vec[:5])
        tail = ", ".join(f"{v:g}" for v in vec[-5:])
        print(f"i0 = 0, i1 = 0\n{head}, ...{tail},")
    else:
        raise ValueError(f"unknown artifact kind {meta['kind']!r}")
    return 0


def cmd_bench(args) -> int:
    """Measure decode / feature-extraction throughput under the pinned
    protocol (utils/benchmarking.PROTOCOL) on the current device. Weights
    may be a real checkpoint or omitted (random full-size shapes)."""
    compute = _setup(args)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.utils.benchmarking import PROTOCOL, timeit_pipelined

    qtype = args.qtype or "q8_0"
    out = {"device": str(jax.devices()[0]), "protocol": PROTOCOL, "qtype": qtype,
           "compute": args.compute}
    rng = np.random.default_rng(args.seed)
    if args.model == "gru":
        from ggml_experiments_tpu.models import gru_textgen
        from ggml_experiments_tpu.models.gru_textgen import GRUConfig

        if args.weights:
            from ggml_experiments_tpu.formats.gru_bin import load_gru_any

            params = load_gru_any(args.weights, qtype=qtype)
        else:
            from ggml_experiments_tpu.ops.gru import GRUCellParams
            from ggml_experiments_tpu.quant import quantize

            cfg = GRUConfig()
            v, e, u = cfg.vocab_size, cfg.embed_dim, cfg.units
            params = gru_textgen.GRUTextGenParams(
                embeddings=jnp.asarray((rng.standard_normal((v, e)) * 0.05).astype(np.float32)),
                cell=GRUCellParams(
                    kernel=quantize((rng.standard_normal((e, 3 * u)) * 0.05).astype(np.float32), qtype),
                    recurrent_kernel=quantize(
                        (rng.standard_normal((u, 3 * u)) * 0.05).astype(np.float32), qtype),
                    bias=jnp.asarray((rng.standard_normal((2, 3 * u)) * 0.05).astype(np.float32)),
                ),
                dense_kernel=quantize((rng.standard_normal((u, v)) * 0.05).astype(np.float32), qtype),
                dense_bias=jnp.zeros((v,), jnp.float32),
            )
        v = params.vocab_size
        b, steps = args.batch, args.steps
        prompt = jnp.asarray(rng.integers(0, v, (b, 8)), jnp.int32)
        lengths = jnp.full((b,), 8, jnp.int32)
        best = timeit_pipelined(
            lambda: gru_textgen.decode(params, prompt, lengths, steps,
                                       compute_dtype=compute)
        )
        out.update(model="gru", batch=b, steps=steps,
                   ms_per_call=round(best * 1e3, 2),
                   tokens_per_s=round(b * steps / best, 1))
    else:
        from ggml_experiments_tpu.models.mobilevit import (
            MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
        )
        from ggml_experiments_tpu.utils.image import synthetic_test_image

        cfg = MobileViTConfig()
        if args.weights:
            from ggml_experiments_tpu.formats.ggml_named import read_named_tensors

            named = read_named_tensors(args.weights)
        else:
            named = random_named_tensors(cfg)
        mv = from_named_tensors(named, cfg, qtype=qtype)
        feat = jax.jit(extract_features, static_argnames=("compute_dtype",))
        imgs = jnp.asarray(np.stack([synthetic_test_image(cfg.image_size)] * args.batch))
        best = timeit_pipelined(lambda: feat(mv, imgs, compute_dtype=compute))
        out.update(model="mobilevit", batch=args.batch,
                   ms_per_call=round(best * 1e3, 2),
                   images_per_s=round(args.batch / best, 1))
    print(json.dumps(out))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="ggml_experiments_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="GRU text generation (reference rnn_text_gen ./main)")
    g.add_argument("--weights", required=True, help="gru.bin (reference format)")
    g.add_argument("--prompt", action="append", help="prompt (repeat for a batch)")
    g.add_argument("--steps", type=int, default=200, help="total decode steps (reference: 200)")
    g.add_argument("--temperature", type=float, default=0.0, help="0 = greedy (reference)")
    g.add_argument("--top-k", type=int, default=None, help="sample from k best (needs temperature)")
    g.add_argument("--top-p", type=float, default=None, help="nucleus sampling mass")
    g.add_argument("--seed", type=int, default=0)
    _add_common(g)
    g.set_defaults(fn=cmd_generate)

    f = sub.add_parser("features", help="MobileViT feature extraction (reference mobilevit ./main)")
    f.add_argument("--weights", required=True, help="weight.ggml (reference format)")
    f.add_argument("--image", default=None, help="image path (default: synthetic golden image)")
    f.add_argument("--image-size", type=int, default=256, help="input resolution (reference: 256)")
    f.add_argument("--flash-attn", action=argparse.BooleanOptionalAction, default=None,
                   help="fused Pallas attention (scores stay in VMEM; default: "
                        "auto — on for TPU backends, off on CPU)")
    f.add_argument("--fused-layer", action=argparse.BooleanOptionalAction, default=None,
                   help="whole-transformer-layer fused Pallas kernel (one HBM "
                        "round trip per layer; default: auto — on for TPU)")
    f.add_argument("--act-storage", choices=["f8_e5m2", "f8_e4m3", "bfloat16"],
                   default=None,
                   help="EXPERIMENTAL: materialize the early conv-stage "
                        "activations below bf16 (f8_e5m2: measured 1.09x at "
                        "B=128, but every e5m2 scope lands dtop-1 >= 1%% — "
                        "10x outside the 0.1%% accuracy contract; a speed "
                        "knob for accuracy-tolerant uses only; bf16-compute "
                        "only)")
    f.add_argument("--act-storage-scope", choices=["stem", "stem12", "early", "all"],
                   default="early",
                   help="how deep the act-storage policy reaches (narrower = "
                        "less HBM saved, less feature noise)")
    f.add_argument("--f16-convs", action="store_true",
                   help="replicate the reference's f16 conv-kernel load policy")
    f.add_argument("--num-heads", type=int, default=4,
                   help="attention heads (not recoverable from weight shapes)")
    _add_common(f)
    f.set_defaults(fn=cmd_features)

    c = sub.add_parser("classify", help="MobileViT classification (needs classifier weights)")
    c.add_argument("--weights", required=True)
    c.add_argument("--image", default=None)
    c.add_argument("--image-size", type=int, default=256,
                   help="input resolution (not recoverable from weights)")
    c.add_argument("--num-heads", type=int, default=4,
                   help="attention heads (not recoverable from weight shapes)")
    c.add_argument("--top-k", type=int, default=5)
    c.add_argument("--flash-attn", action=argparse.BooleanOptionalAction, default=None,
                   help="fused Pallas attention (see `features --flash-attn`)")
    c.add_argument("--fused-layer", action=argparse.BooleanOptionalAction, default=None,
                   help="whole-layer fused kernel (see `features --fused-layer`)")
    c.add_argument("--act-storage", choices=["f8_e5m2", "f8_e4m3", "bfloat16"],
                   default=None,
                   help="sub-bf16 conv activation storage (see `features --act-storage`)")
    c.add_argument("--act-storage-scope", choices=["stem", "stem12", "early", "all"],
                   default="early",
                   help="see `features --act-storage-scope`")
    _add_common(c)
    c.set_defaults(fn=cmd_classify)

    q = sub.add_parser(
        "quantize",
        help="offline fp32 -> block-quantized native checkpoint "
             "(q8_0/q4_0/.../q4_k; q4_k_m = calibrated GPTQ recipe)")
    q.add_argument("--input", required=True, help="gru.bin or weight.ggml")
    q.add_argument("--output", required=True, help="output .gxt path")
    q.add_argument("--calibrate", default=None, metavar="CORPUS",
                   help="calibration text file: activation-aware (GPTQ-"
                        "compensated) quantization of GRU weights")
    q.add_argument("--calibrate-seqs", type=int, default=384,
                   help="calibration sequences sampled from the corpus")
    _add_common(q)
    # the calibrated mixed recipe is a quantize-time option, not a QTensor
    # format: GPTQ q4_k gates + q8_0 head (quant/calibration.gptq_gru_params)
    for a in q._actions:
        if a.dest == "qtype":
            a.choices = list(a.choices) + ["q4_k_m"]
    q.set_defaults(fn=cmd_quantize)

    s = sub.add_parser("serve", help="interactive continuous-batching text service")
    s.add_argument("--weights", required=True, help="gru.bin or .gxt checkpoint")
    s.add_argument("--slots", type=int, default=16)
    s.add_argument("--max-prompt", type=int, default=64)
    s.add_argument("--inner-steps", type=int, default=16)
    s.add_argument("--steps", type=int, default=200, help="max new tokens per request")
    s.add_argument("--temperature", type=float, default=0.0)
    s.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve a JSON HTTP API instead of the stdin loop "
                        "(POST /v1/generate, GET /v1/health|/v1/stats; 0 = "
                        "ephemeral port)")
    s.add_argument("--host", default="127.0.0.1",
                   help="bind address for --http (default 127.0.0.1)")
    s.add_argument("--fetch-depth", type=int, default=2,
                   help="token readbacks allowed in flight behind the scans")
    s.add_argument("--fetch-async", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="drain token readbacks on a parallel reader thread "
                        "(hides per-sync link latency; see DecodeEngine)")
    _add_common(s)
    s.set_defaults(fn=cmd_serve)

    sv = sub.add_parser("serve-vision",
                        help="continuous-batching image service over HTTP")
    sv.add_argument("--weights", required=True,
                    help="weight.ggml or calibrated .gxt checkpoint")
    sv.add_argument("--http", type=int, default=0, help="port (0 = ephemeral)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--image-size", type=int, default=256)
    sv.add_argument("--batch-sizes", default="8,32,128",
                    help="static collation ladder (comma-separated)")
    _add_common(sv)
    sv.set_defaults(fn=cmd_serve_vision)

    e = sub.add_parser("eval", help="quantization-delta report (logits/top-1/ppl vs fp32)")
    e.add_argument("--weights", required=True, help="gru.bin, .gxt or weight.ggml")
    e.add_argument("--batch", type=int, default=8)
    e.add_argument("--length", type=int, default=64, help="sequence length (GRU eval)")
    e.add_argument("--corpus", default=None,
                   help="held-out text for GRU eval (default: random token seqs)")
    e.add_argument("--image-size", type=int, default=256,
                   help="input resolution for MobileViT eval")
    e.add_argument("--num-heads", type=int, default=4,
                   help="attention heads for MobileViT eval")
    e.add_argument("--seed", type=int, default=0)
    _add_common(e)
    e.set_defaults(fn=cmd_eval)

    t = sub.add_parser("train-gru", help="train the char GRU (reference training script)")
    t.add_argument("--corpus", required=True, help="text file (e.g. shakespeare.txt)")
    t.add_argument("--epochs", type=int, default=20)
    t.add_argument("--seq-length", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=64)
    t.add_argument("--embed-dim", type=int, default=256)
    t.add_argument("--units", type=int, default=1024)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--checkpoint", default=None, help="best-by-loss .gxt path")
    t.add_argument("--resume", default=None,
                   help="full train-state .gxt (params+Adam+step): written every "
                        "--save-every steps, and an existing file resumes the "
                        "interrupted run bit-exactly")
    t.add_argument("--save-every", type=int, default=0,
                   help="steps between train-state saves (needs --resume)")
    t.add_argument("--output", default=None, help="export final weights as gru.bin")
    t.add_argument("--eval-corpus", default=None, help="held-out text for val ppl")
    t.add_argument("--eval-every", type=int, default=0,
                   help="validation ppl every N steps (needs --eval-corpus)")
    _add_common(t)
    t.set_defaults(fn=cmd_train_gru)

    ax = sub.add_parser("aot-export",
                        help="freeze a shape-specialized program to a .gxa artifact")
    ax.add_argument("--model", choices=["gru", "mobilevit"], default="gru")
    ax.add_argument("--weights", required=True)
    ax.add_argument("--output", required=True, help=".gxa artifact path")
    ax.add_argument("--batch", type=int, default=8)
    ax.add_argument("--prompt-len", type=int, default=50, help="gru: max prompt chars")
    ax.add_argument("--steps", type=int, default=200,
                    help="gru: total decode steps (reference default 200)")
    ax.add_argument("--image-size", type=int, default=256,
                    help="mobilevit input resolution (reference: 256)")
    ax.add_argument("--platforms", default=None,
                    help="comma list (e.g. cpu,tpu); default: current backend")
    _add_common(ax)
    ax.set_defaults(fn=cmd_aot_export)

    ar = sub.add_parser("aot-run", help="run a .gxa artifact against a weight file")
    ar.add_argument("--artifact", required=True)
    ar.add_argument("--weights", required=True)
    ar.add_argument("--prompt", default=None)
    ar.add_argument("--image", default=None)
    _add_common(ar)
    ar.set_defaults(fn=cmd_aot_run)

    b = sub.add_parser("bench", help="throughput under the pinned protocol (JSON)")
    b.add_argument("--model", choices=["gru", "mobilevit"], default="gru")
    b.add_argument("--weights", default=None,
                   help="gru.bin/.gxt or weight.ggml (default: random full-size)")
    b.add_argument("--batch", type=int, default=1024)
    b.add_argument("--steps", type=int, default=256, help="decode steps (gru)")
    b.add_argument("--seed", type=int, default=0)
    _add_common(b)
    b.set_defaults(fn=cmd_bench)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
