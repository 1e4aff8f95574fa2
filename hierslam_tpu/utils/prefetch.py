"""Background frame prefetching.

The reference loads frames synchronously on the hot path
(scripts/hierslam.py:1764-1771).  Decoding + resizing a 1200x680 JPEG/PNG
pair costs ~10-20ms of host time per frame; with a remote TPU the host is
otherwise idle during device steps, so a one-frame-lookahead thread hides
it entirely (cv2/imageio release the GIL around their native codecs)."""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class Prefetcher:
    """Iterate ``load(i)`` for i in [start, end) with ``depth`` lookahead."""

    def __init__(self, load: Callable[[int], object], start: int, end: int, depth: int = 2):
        self.load = load
        self.indices = list(range(start, end))
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.err: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for i in self.indices:
                self.q.put((i, self.load(i)))
        except BaseException as e:  # surfaced on the consumer side
            self.err = e
        finally:
            self.q.put(None)

    def __iter__(self) -> Iterator:
        while True:
            item = self.q.get()
            if item is None:
                if self.err is not None:
                    raise self.err
                return
            yield item
