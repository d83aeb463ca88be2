"""Background-thread prefetching around any batch iterable.

Replaces the reference's FastDataLoader persistent-worker trick
(data_loader/FastDataLoader.py:5-24): instead of keeping torch workers alive
across epochs, a daemon thread keeps a bounded queue of ready host batches so
image decode overlaps device compute."""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2):
        self._iterable = iterable
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err = []

        def worker():
            try:
                for item in self._iterable:
                    q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


def prefetch(iterable, depth: int = 2):
    return PrefetchIterator(iterable, depth)
