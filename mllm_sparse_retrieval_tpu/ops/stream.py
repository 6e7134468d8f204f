"""Bounded dispatch-ahead pipeline, shared by every device serving loop.

The serving pattern on thin-link hosts: keep up to ``lookahead`` device
programs in flight ahead of the consumer so batch r+1's query upload and
compute overlap batch r's result fetch and host-side post-processing.
One implementation (impact search streaming, dense batch search, the
encode pipeline all use it) so queue-depth fixes land everywhere at once.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")
D = TypeVar("D")
R = TypeVar("R")


def pipeline_dispatch(
    items: Iterable[T],
    dispatch: Callable[[T], D],
    resolve: Callable[[D], Optional[R]],
    lookahead: int = 2,
) -> Iterator[R]:
    """Run ``dispatch`` up to ``lookahead`` items ahead of ``resolve``.

    ``dispatch`` must enqueue device work WITHOUT a host sync and return a
    handle; ``resolve`` syncs on a handle and may return a result to yield
    (``None`` results are swallowed — drain with ``deque(..., maxlen=0)``
    when only the side effects matter).
    """
    pending: "collections.deque[D]" = collections.deque()
    depth = max(lookahead, 1)
    for item in items:
        while len(pending) >= depth:
            out = resolve(pending.popleft())
            if out is not None:
                yield out
        pending.append(dispatch(item))
    while pending:
        out = resolve(pending.popleft())
        if out is not None:
            yield out


def prefetch_thread(items: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Run the producer iterable on a daemon thread, ``depth`` items ahead.

    For host-prep stages (numpy query packing, tokenization, image decode)
    feeding a device pipeline: the consumer's blocking device fetches
    release the GIL, so the producer makes real progress during exactly the
    waits that otherwise serialize with it. Ordering is preserved; producer
    exceptions re-raise at the consumption point; abandoning the iterator
    (break / GC) unblocks and stops the worker.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in items:
                if not _put(item):
                    return
        except BaseException as e:  # surface to the consumer
            _put(e)
            return
        _put(_END)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # release queued references
            try:
                q.get_nowait()
            except queue.Empty:
                break
