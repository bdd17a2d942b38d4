"""Background batch production.

Reference: ``elektronn2/training/parallelisation.py::BackgroundProc,
SharedQ, SharedMem`` — fork()ed worker processes pushing batches through
shared ctypes memory. That design existed because Theano held the GIL during
augmentation; it is on the SURVEY.md do-not-mirror list.

TPU-first redesign: a thread pool keeps ``getbatch`` running ahead of the
consumer. Numpy interpolation/BLAS release the GIL, h5 reads are IO-bound,
and the heavy augmentation moves on-device (ops/warp.py) — so threads +
queue reach the same goal with zero serialisation cost and graceful
shutdown. The public surface (``get()``, ``reset()``, ``shutdown()``)
matches the reference.
"""

from __future__ import annotations

import queue
import threading
import time

from elektronn2_tpu.log import logger


class TimeoutError(RuntimeError):
    pass


class BackgroundProc:
    """Run ``target(*args, **kwargs)`` repeatedly in background threads,
    buffering results in a bounded queue.

    Usage (mirrors the reference):
        bg = BackgroundProc(data.getbatch, n_proc=2,
                            target_args=(batch_size,),
                            target_kwargs=batch_kwargs)
        batch = bg.get()
        ...
        bg.shutdown()
    """

    def __init__(self, target, n_proc=2, target_args=(), target_kwargs=None,
                 queue_size=4, profile=False):
        self.target = target
        self.target_args = tuple(target_args)
        self.target_kwargs = dict(target_kwargs or {})
        self.q = queue.Queue(maxsize=max(1, int(queue_size)))
        self._stop = threading.Event()
        self._exc = None
        self.profile = profile
        self._produced = 0
        self._threads = [threading.Thread(target=self._work, daemon=True,
                                          name=f"bgproc-{i}")
                         for i in range(max(1, int(n_proc)))]
        for t in self._threads:
            t.start()

    def _work(self):
        while not self._stop.is_set():
            try:
                t0 = time.perf_counter()
                item = self.target(*self.target_args, **self.target_kwargs)
                if self.profile:
                    logger.debug(f"bgproc item in "
                                 f"{time.perf_counter() - t0:.3f}s")
            except Exception as e:  # propagate to consumer
                self._exc = e
                self._stop.set()
                break
            while not self._stop.is_set():
                try:
                    self.q.put(item, timeout=0.2)
                    self._produced += 1
                    break
                except queue.Full:
                    continue

    def get(self, timeout=60.0):
        """Fetch the next ready batch (blocking)."""
        deadline = time.monotonic() + timeout
        while True:
            if self._exc is not None:
                raise RuntimeError("background worker failed") from self._exc
            try:
                return self.q.get(timeout=0.2)
            except queue.Empty:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"no batch produced within {timeout}s")

    def reset(self):
        """Drop buffered batches (e.g. after data parameters changed)."""
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def shutdown(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    def __del__(self):
        try:
            self._stop.set()
        except Exception:
            pass


#: reference alias — the queue abstraction and the proc pool were separate
#: classes there; the thread rebuild needs only one.
SharedQ = BackgroundProc
