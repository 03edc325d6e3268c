"""Streaming chunked vector reader.

Reference: vectors_reader + safe_bounded_queue (vector_io.hpp:186-290) — a
producer thread reads 1M-vector chunks into a bounded queue of depth 2 so disk
IO overlaps encoding (db_add.cpp:59-82). Same design here with queue.Queue;
the consumer overlaps host IO with device encoding.
"""

from __future__ import annotations

import queue
import threading

from qadc_tpu.io.vecs import load_vectors, vecs_info

DEFAULT_CHUNK = 1_000_000  # reference: vector_io.hpp:243
QUEUE_DEPTH = 2            # reference: vector_io.hpp:231


class VectorStream:
    """Iterate (offset, chunk_array) over a vecs file with background reads."""

    def __init__(self, path: str, chunk_size: int = DEFAULT_CHUNK, to_float: bool = True):
        self.path = path
        self.chunk_size = chunk_size
        self.to_float = to_float
        self.dim, self.count = vecs_info(path)
        self._q: queue.Queue = queue.Queue(maxsize=QUEUE_DEPTH)
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def _produce(self):
        try:
            for off in range(0, self.count, self.chunk_size):
                n = min(self.chunk_size, self.count - off)
                self._q.put((off, load_vectors(self.path, off, n, self.to_float)))
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._q.put(None)

    def __iter__(self):
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()
        while True:
            item = self._q.get()
            if item is None:
                if self._error is not None:
                    raise self._error
                return
            yield item
