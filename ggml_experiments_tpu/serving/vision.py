"""Continuous-batching MobileViT serving engine.

The reference's vision path is a single-image ``main()`` (one stbi_load, one
graph compute, mobilevit/main.cpp:649-706). This engine makes it a service,
the vision counterpart of :class:`~.engine.DecodeEngine`: variable-arrival
``features``/``classify`` requests collate into fixed-shape device batches
(a static size ladder keeps one compiled program per shape — XLA retraces
per shape, and tunneled-TPU compiles are minutes cold), run through the
production jitted forward (fused transformer-layer kernels and all), and
stream back through a depth-bounded readback pipeline so device compute
overlaps host readback exactly like the decode engine's fetch pipeline.

Design choices mirrored from DecodeEngine (serving/engine.py):
* a worker thread owns the device; submitters get a future-like Request
* request-level cancel (queued requests never dispatch; in-flight batches
  complete and their canceled members' results are dropped)
* a worker exception releases every waiting request with ``engine.error``
  set instead of stranding callers
* per-phase wall breakdown (collate/dispatch/readback/distribute) in the
  stats object, same honesty contract as EngineStats.breakdown()

Unlike decode, vision requests are single-shot (no recurrent state, no
slots): "continuous batching" here means the collation loop never waits for
a full batch — it ships whatever is queued at the smallest ladder size that
fits, padding the tail (padded rows are real compute waste, counted in
``stats.padded_images``).

Multi-process note (deliberate design): the DECODE engine must coordinate
hosts because its slot state is one SPMD program (serving/engine.py refill
broadcast). Vision inference is stateless, so the right multi-host shape is
N independent engines behind any request balancer — no cross-host
coordination to build, nothing to drift. TP-sharded vision params (for a
model too big per chip — not this one) still work through a single engine,
since the jitted forward carries the params' mesh shardings.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VisionRequest:
    image: np.ndarray           # (H, W, 3) float32, preprocessed
    kind: str = "classify"      # 'classify' | 'features'
    id: int = -1
    _done: threading.Event = dataclasses.field(default_factory=threading.Event)
    _result: Optional[np.ndarray] = None
    _canceled: bool = False
    _error: Optional[Exception] = None

    def cancel(self) -> None:
        """Queued requests never dispatch; a request already inside a device
        batch completes on-device and its result is dropped on return."""
        self._canceled = True
        self._done.set()

    @property
    def done(self) -> bool:
        return self._done.is_set()

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self._done.wait(timeout):
            raise TimeoutError(f"vision request {self.id} timed out")
        if self._error is not None:
            raise RuntimeError(f"vision engine failed: {self._error!r}") from self._error
        if self._canceled:
            raise RuntimeError(f"vision request {self.id} was canceled")
        return self._result


@dataclasses.dataclass
class VisionStats:
    images_done: int = 0
    requests_canceled: int = 0
    batches: int = 0
    padded_images: int = 0      # ladder padding: dispatched but unclaimed rows
    wall_time_s: float = 0.0
    collate_s: float = 0.0      # queue drain + host stack/pad
    dispatch_s: float = 0.0     # jitted call until async dispatch returns
    readback_s: float = 0.0     # blocking device->host sync of the oldest batch
    distribute_s: float = 0.0   # handing results to requests
    readback_bytes: int = 0

    @property
    def images_per_s(self) -> float:
        return self.images_done / self.wall_time_s if self.wall_time_s else 0.0

    def breakdown(self) -> dict:
        total = max(self.wall_time_s, 1e-9)
        return {
            "images_per_s": round(self.images_per_s, 1),
            "batches": self.batches,
            "pad_fraction": round(
                self.padded_images / max(self.images_done + self.padded_images, 1), 4),
            "collate_share": round(self.collate_s / total, 4),
            "dispatch_share": round(self.dispatch_s / total, 4),
            "readback_share": round(self.readback_s / total, 4),
            "distribute_share": round(self.distribute_s / total, 4),
            "readback_mb": round(self.readback_bytes / 1e6, 2),
        }


class VisionEngine:
    """Continuous-batching image inference over a MobileViT params pytree.

    ``batch_sizes``: ascending static shape ladder; each queued burst ships
    at the smallest size that fits (largest = the throughput shape — 128
    matches the offline headline). ``pipeline_depth``: device batches in
    flight before the loop blocks on the oldest readback (2 overlaps
    compute with the host sync; decode's fetch pipeline, simplified).
    """

    def __init__(
        self,
        params,
        *,
        image_size: int = 256,
        batch_sizes: Tuple[int, ...] = (8, 32, 128),
        compute_dtype=jnp.bfloat16,
        pipeline_depth: int = 2,
        max_pending: int = 4096,
        transport: str = "u8",
    ):
        from ggml_experiments_tpu.models.mobilevit import classify, extract_features

        self.params = params
        self.image_size = int(image_size)
        self.batch_sizes = tuple(sorted(int(b) for b in batch_sizes))
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.max_pending = int(max_pending)
        self._compute_dtype = compute_dtype
        if transport not in ("u8", "f32"):
            raise ValueError(f"transport must be 'u8' or 'f32', got {transport!r}")
        # 'u8' (default): requests carry the resized u8 canvas
        # (utils.image.preprocess_canvas_u8) and the reference's x/255
        # normalization runs ON DEVICE inside the jitted forward — 4x fewer
        # host->device bytes per image, which is the e2e wall for image
        # serving on bandwidth-constrained links (measured ~1.4 GB/s on the
        # dev tunnel: a 0.79MB f32 image costs more link time than its
        # 0.11ms of device compute). 'f32' accepts already-normalized float
        # images (arbitrary mean/std preprocessing, or synthetic float data).
        self.transport = transport

        def _u8(fn):
            def wrapped(params, xu8, *, compute_dtype):
                return fn(params, xu8.astype(jnp.float32) / 255.0,
                          compute_dtype=compute_dtype)
            return wrapped

        wrap = _u8 if transport == "u8" else (lambda f: f)
        self._fns = {
            "classify": jax.jit(wrap(classify), static_argnames=("compute_dtype",)),
            "features": jax.jit(wrap(extract_features),
                                static_argnames=("compute_dtype",)),
        }
        if params.classifier_kernel is None:
            del self._fns["classify"]
        self._queues: Dict[str, deque] = {k: deque() for k in self._fns}
        self._qlock = threading.Lock()
        self._pending = 0   # queued, not yet collated (backpressure gauge)
        self._open = 0      # submitted, not yet resolved (drain gauge)
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._next_id = 0
        self._id_lock = threading.Lock()
        self.stats = VisionStats()
        self.error: Optional[Exception] = None

    # -- submission -----------------------------------------------------------

    def submit(self, image: np.ndarray, kind: str = "classify") -> VisionRequest:
        if self.error is not None:
            raise RuntimeError(f"vision engine failed: {self.error!r}") from self.error
        if kind not in self._fns:
            raise ValueError(f"kind must be one of {sorted(self._fns)}, got {kind!r}")
        dt = np.uint8 if self.transport == "u8" else np.float32
        img = np.asarray(image)
        if img.dtype != dt:
            raise ValueError(
                f"transport={self.transport!r} expects {np.dtype(dt).name} "
                f"images, got {img.dtype} (u8: utils.image.preprocess_canvas_u8; "
                f"f32: utils.image.preprocess)")
        want = (self.image_size, self.image_size, 3)
        if img.shape != want:
            raise ValueError(f"image shape {img.shape} != {want} "
                             f"(preprocess with utils.image first)")
        with self._qlock:
            if self._pending >= self.max_pending:
                raise RuntimeError(
                    f"vision engine backlog at max_pending={self.max_pending}")
            req = VisionRequest(image=img, kind=kind)
            with self._id_lock:
                req.id = self._next_id
                self._next_id += 1
            self._queues[kind].append(req)
            self._pending += 1
            self._open += 1
        self._wake.set()
        return req

    # -- lifecycle ------------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="vision-engine")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=600)
            self._thread = None

    def run_until_idle(self, timeout: float = 600.0) -> None:
        """Synchronous drain (tests): start if needed, wait until empty."""
        self.start()
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            with self._qlock:
                empty = self._open == 0
            if empty:
                return
            time.sleep(0.005)
        raise TimeoutError("vision engine did not drain")

    # -- worker ---------------------------------------------------------------

    def _collate(self):
        """Pop the longest kind-homogeneous burst; returns (kind, reqs) or
        None when nothing is queued."""
        with self._qlock:
            kind = None
            best = 0
            for k, q in self._queues.items():
                if len(q) > best:
                    kind, best = k, len(q)
            if kind is None or best == 0:
                return None
            cap = self.batch_sizes[-1]
            reqs: List[VisionRequest] = []
            q = self._queues[kind]
            while q and len(reqs) < cap:
                r = q.popleft()
                self._pending -= 1
                if r._canceled:
                    self.stats.requests_canceled += 1
                    self._open -= 1
                    continue
                reqs.append(r)
            return (kind, reqs) if reqs else None

    def _flush_oldest(self, inflight: deque) -> None:
        dev, reqs, n_pad = inflight.popleft()
        t0 = time.perf_counter()
        out = np.asarray(dev)
        self.stats.readback_s += time.perf_counter() - t0
        self.stats.readback_bytes += out[: len(reqs)].nbytes
        t1 = time.perf_counter()
        resolved = 0
        for i, r in enumerate(reqs):
            resolved += 1
            if r._canceled:
                self.stats.requests_canceled += 1
                continue
            r._result = out[i]
            r._done.set()
            self.stats.images_done += 1
        with self._qlock:
            self._open -= resolved
        self.stats.padded_images += n_pad
        self.stats.batches += 1
        self.stats.distribute_s += time.perf_counter() - t1

    def _run(self) -> None:
        inflight: deque = deque()
        reqs: List[VisionRequest] = []   # the burst currently in hand
        t_start = time.perf_counter()
        try:
            while not self._stop.is_set():
                t0 = time.perf_counter()
                burst = self._collate()
                if burst is None:
                    while inflight:
                        self._flush_oldest(inflight)
                    self.stats.wall_time_s = time.perf_counter() - t_start
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
                kind, reqs = burst
                b = next((s for s in self.batch_sizes if s >= len(reqs)),
                         self.batch_sizes[-1])
                dt = np.uint8 if self.transport == "u8" else np.float32
                x = np.zeros((b, self.image_size, self.image_size, 3), dt)
                for i, r in enumerate(reqs):
                    x[i] = r.image
                self.stats.collate_s += time.perf_counter() - t0

                t1 = time.perf_counter()
                out = self._fns[kind](self.params, jnp.asarray(x),
                                      compute_dtype=self._compute_dtype)
                try:
                    out.copy_to_host_async()
                except Exception:  # pragma: no cover - no async copies
                    pass
                self.stats.dispatch_s += time.perf_counter() - t1
                inflight.append((out, reqs, b - len(reqs)))
                reqs = []
                while len(inflight) > self.pipeline_depth:
                    self._flush_oldest(inflight)
            while inflight:
                self._flush_oldest(inflight)
        except Exception as exc:  # release every waiter (decode-engine policy)
            self.error = exc
            with self._qlock:
                leftovers = [r for q in self._queues.values() for r in q]
                for q in self._queues.values():
                    q.clear()
                self._pending = 0
            leftovers.extend(reqs)           # the burst that was in hand
            for _, rs, _ in inflight:
                leftovers.extend(rs)
            for r in leftovers:
                r._error = exc
                r._done.set()
            with self._qlock:
                self._open = 0
        finally:
            self.stats.wall_time_s = time.perf_counter() - t_start
