"""Threaded input feeder with double buffering.

Plays the role of the reference's ``-w`` CPU worker threads
(ocl_aho_grep.c:36-144 cpu_worker): overlap file reads with device compute.
Each feeder owns a disjoint round-robin subset of the input files
(``cur_file += thread_no``, ocl_aho_grep.c:87) and its own DataBuffer; full
batches flow through a bounded queue to the single device consumer — on TPU
the device work is submitted from one thread, but reads, batch assembly, and
device compute overlap (the reference's rounds are fully serialized per
thread, SURVEY.md section 3.2).

Follow mode (``-F``, README:19-22): feeders loop back over their file set,
re-reading appended data from the saved per-stream offset, so growing files
and FIFOs are processed continuously.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable

from tpu_pattern_matching.runtime.buffers import DataBuffer, HostBatch, StreamState


@dataclasses.dataclass
class FeedItem:
    batch: HostBatch
    lines: int
    bytes: int


_SENTINEL = None


class Feeder:
    def __init__(
        self,
        filenames: list[str],
        *,
        n_workers: int,
        max_chunks: int,
        chunk_len: int,
        halo: int,
        text_mode: bool = False,
        follow: bool = False,
        queue_depth: int = 4,
    ):
        self.filenames = filenames
        self.n_workers = max(1, min(n_workers, len(filenames) or 1))
        self.max_chunks = max_chunks
        self.chunk_len = chunk_len
        self.halo = halo
        self.text_mode = text_mode
        self.follow = follow
        self.q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self.terminate = threading.Event()
        self._threads: list[threading.Thread] = []

    # ------------------------------------------------------------- workers

    def _worker(self, wid: int) -> None:
        buf = DataBuffer(self.max_chunks, self.chunk_len, self.halo)
        streams: dict[int, StreamState] = {}
        handles: dict[int, object] = {}
        pend_bytes = 0
        pend_lines = 0

        def flush():
            nonlocal pend_bytes, pend_lines
            if buf.chunks:
                # hand off the arrays; allocate a fresh buffer for reuse
                self.q.put(FeedItem(buf.to_batch(), pend_lines, pend_bytes))
                buf._alloc()
                pend_bytes = 0
                pend_lines = 0

        try:
            while not self.terminate.is_set():
                progressed = False
                cur = wid
                while cur < len(self.filenames):
                    if self.terminate.is_set():
                        break
                    if cur not in handles:
                        handles[cur] = open(self.filenames[cur], "rb")
                        streams[cur] = StreamState(file_id=cur)
                    else:
                        # follow mode: seek back to where we left off
                        handles[cur].seek(streams[cur].offset)
                    fobj, stream = handles[cur], streams[cur]
                    while True:
                        if self.text_mode:
                            code, rd, lines = buf.add_lines(fobj, stream)
                            pend_lines += lines
                        else:
                            code, rd = buf.add_stream(fobj, stream)
                        pend_bytes += rd
                        progressed = progressed or rd > 0
                        if code == -1:
                            flush()
                            continue
                        if rd == 0:
                            break
                    cur += self.n_workers
                if not self.follow:
                    break
                if not progressed:
                    # quiescent: deliver whatever is buffered so trickle-fed
                    # FIFOs/logs see timely results (the reference only
                    # processes on a FULL buffer in follow mode — a starvation
                    # bug for slow streams we deliberately fix), then idle
                    # briefly to avoid a busy loop.
                    flush()
                    self.terminate.wait(0.05)
            flush()
        finally:
            for h in handles.values():
                try:
                    h.close()
                except Exception:
                    pass
            self.q.put(_SENTINEL)

    # ----------------------------------------------------------------- API

    def start(self) -> None:
        for wid in range(self.n_workers):
            t = threading.Thread(target=self._worker, args=(wid,), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self.terminate.set()

    def __iter__(self):
        done = 0
        while done < self.n_workers:
            item = self.q.get()
            if item is _SENTINEL:
                done += 1
                continue
            yield item
