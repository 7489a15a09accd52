"""prefetch() concurrency helper: ordering, errors, abandonment, emptiness."""
import threading
import time

import pytest

from aa_clip_iqm_tpu.data.datasets import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(50)), depth=3)) == list(range(50))


def test_empty_iterator():
    assert list(prefetch(iter([]))) == []


def test_worker_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    it = prefetch(gen())
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_abandoned_consumer_stops_worker():
    produced = []
    release = threading.Event()

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-stream (e.g. training step raised)
    release.set()
    # worker must unblock and stop producing promptly
    deadline = time.time() + 5
    while time.time() < deadline:
        n_threads = threading.active_count()
        if len(produced) < 100:
            break
        time.sleep(0.05)
    assert len(produced) < 100  # did not drain the whole iterator
    time.sleep(0.3)
    final = len(produced)
    time.sleep(0.3)
    assert len(produced) == final  # production actually stopped
