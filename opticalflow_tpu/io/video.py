"""Asynchronous video encoding for the streaming overlay pipeline.

``AsyncVideoWriter`` wraps ``cv2.VideoWriter`` behind a worker thread with a
bounded queue, so mp4 encoding runs concurrently with overlay drawing — the
reference's hot loop encodes inline (``pwc_extract_flow_video.py:219-308``),
serializing the two stages; at Sintel resolution overlay and encode each run
in the low hundreds of fps, so overlapping them roughly doubles the
streaming throughput (PERF.md round-3 breakdown).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["AsyncVideoWriter"]


class AsyncVideoWriter:
    """Drop-in for ``cv2.VideoWriter`` with a background encode thread.

    ``write`` enqueues (blocking only when ``queue_size`` frames are
    already pending); ``release`` drains the queue, releases the underlying
    writer, and re-raises any encoder error.
    """

    def __init__(self, path: str, fourcc: int, fps: float,
                 frame_size: Tuple[int, int], *, queue_size: int = 32):
        import cv2
        self._wr = cv2.VideoWriter(path, fourcc, fps, frame_size)
        self._opened = self._wr.isOpened()
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(
            maxsize=queue_size)
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._encode_loop, daemon=True)
        self._thread.start()

    def _encode_loop(self) -> None:
        while True:
            frame = self._q.get()
            if frame is None:
                break
            try:
                self._wr.write(frame)
            except BaseException as e:  # surface on the caller's thread
                self._exc = e
                break
        self._wr.release()

    def isOpened(self) -> bool:  # noqa: N802 — cv2.VideoWriter API
        return self._opened

    def _put(self, item: Optional[np.ndarray]) -> None:
        # bounded-wait put: if the encoder thread died (its exception is in
        # self._exc) nobody will drain the queue — a plain blocking put
        # would deadlock the producer with the error never surfacing
        while True:
            if self._exc is not None:
                raise self._exc
            if not self._thread.is_alive():
                raise RuntimeError("encoder thread is not running "
                                   "(write after release?)")
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    def write(self, frame: np.ndarray) -> None:
        self._put(frame)

    def release(self) -> None:
        if self._thread.is_alive():
            try:
                self._put(None)
            except Exception:
                pass  # encoder died; its error is re-raised below
            self._thread.join()
        if self._exc is not None:
            raise self._exc
