"""Compatibility alias: a Thread whose join() returns the target's result
(the reference's concurrency helper, thread_returning.py:11-25).  The
pipelines themselves use ThreadPoolExecutor futures (segmenter.py,
vfs.py); this exists for user code written against the reference API."""

from threading import Thread

__all__ = ["ThreadReturning"]


class ThreadReturning(Thread):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._result = None

    def run(self):
        if self._target is not None:
            self._result = self._target(*self._args, **self._kwargs)

    def join(self, *args):
        super().join(*args)
        return self._result
