"""_prefetched reader-thread lifecycle: an abandoned consumer must release
the daemon reader thread (reused Python workers leak otherwise)."""

from __future__ import annotations

import threading
import time


def test_prefetch_reader_released_on_abandon():
    from ocr_wrapper_spark.operators.extract import _prefetched

    produced = []

    def slow_batches():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    gen = _prefetched(slow_batches(), depth=1)
    assert next(gen) == 0
    gen.close()  # abandon mid-stream -> finally sets stop + drains
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "reader thread leaked"
    assert len(produced) < 1000, "reader should stop early, not drain the source"


def test_prefetch_passthrough_and_error_propagation():
    from ocr_wrapper_spark.operators.extract import _prefetched

    assert list(_prefetched(iter(range(50)))) == list(range(50))

    def failing():
        yield 1
        raise RuntimeError("boom")

    out = []
    try:
        for x in _prefetched(failing()):
            out.append(x)
        raised = False
    except RuntimeError:
        raised = True
    assert raised and out == [1]


def test_prefetch_error_propagates_even_when_queue_stays_full():
    """The reader must not drop an upstream exception because the queue
    was full at that moment (slow consumer): it retries until delivered,
    otherwise the consumer would block in q.get() forever."""
    from ocr_wrapper_spark.operators.extract import _prefetched

    def failing():
        yield 1
        yield 2
        raise RuntimeError("late boom")

    gen = _prefetched(failing(), depth=1)
    assert next(gen) == 1
    time.sleep(1.2)  # > the reader's 0.5 s put timeout while queue is full
    assert next(gen) == 2
    try:
        next(gen)
        raised = False
    except RuntimeError:
        raised = True
    assert raised, "exception was dropped instead of propagated"
