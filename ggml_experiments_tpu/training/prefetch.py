"""Background host->device input prefetching for training.

The reference's tf.data pipeline prefetches with AUTOTUNE
(rnn_text_generation.py:40); this is the JAX equivalent: a daemon thread pulls
host batches, device_put's them (optionally with a sharding), and keeps a
small queue full so the accelerator never waits on the host. Double-buffered
by default (depth 2).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable,
    *,
    depth: int = 2,
    sharding=None,
) -> Iterator:
    """Wrap a host batch iterable, yielding device-resident pytrees.

    ``sharding``: optional jax.sharding.Sharding applied to every array leaf
    (e.g. NamedSharding(mesh, P('data')) for DP batches). Exceptions in the
    producer propagate to the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def put(item):
        if sharding is not None:
            item = jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), item)
        else:
            item = jax.tree_util.tree_map(jax.device_put, item)
        q.put(item)

    def producer():
        try:
            for item in batches:
                put(item)
        except Exception as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
