"""Host→device prefetch: the spill path for datasets that exceed HBM.

The flagship datasets pack into HBM whole (9.3 GB at full Gwilliams scale —
RESULTS.md), so the default batch path is a device-resident gather with no
host involvement.  When a dataset does NOT fit (more subjects, higher
sample rates), this module supplies the TPU-native replacement for the
reference's DataLoader worker processes (``utils/get_dataloaders.py:13,74``,
``num_workers: 6``): a background thread stages the next batches'
host→device transfers while the current step runs, so the copy rides under
compute instead of serializing with it (SURVEY §2.11 "host→device prefetch
pipeline (double-buffering)").
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable,
    size: int = 2,
    device_put: Callable | None = None,
) -> Iterator:
    """Iterate ``batches``, staying ``size`` device transfers ahead.

    ``batches`` yields pytrees of host arrays (e.g. a generator calling a
    host-side gather).  Each is moved to device with ``device_put``
    (default: ``jax.device_put`` — pass a sharding-aware closure such as
    ``lambda b: shard_batch(mesh, b)`` for data-parallel runs) on a worker
    thread; ``jax.device_put`` is async, so the H2D DMA overlaps both the
    producer's next host gather and the consumer's running step.

    Exceptions in the producer propagate to the consumer at the point of
    iteration.  Abandoning the iterator early (a mid-epoch error or
    ``break`` in the consumer) signals the worker to stop: it would
    otherwise block on the full queue forever, pinning ``size``
    device-resident batches plus the producer's closure for the rest of the
    process.  The worker is additionally a daemon thread, so interpreter
    shutdown can never hang on it.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    put = device_put or jax.device_put
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def _put(item) -> bool:
        """Queue-put that gives up when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in batches:
                if not _put(put(batch)):
                    return
        except BaseException as e:  # surfaced to the consumer below
            _put((_SENTINEL, e))
            return
        _put((_SENTINEL, None))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if (isinstance(item, tuple) and len(item) == 2
                    and item[0] is _SENTINEL):
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        stop.set()
        while not q.empty():  # release buffered batches promptly
            try:
                q.get_nowait()
            except queue.Empty:
                break
