"""Streaming buffer manager.

TPU-native counterpart of the reference's databuf layer (databuf.c): turns
byte streams into fixed-shape batches the jitted scan consumes — static
shapes are what keeps everything compiled once.

Shape contract (see ops.match_xla): a batch is ``[C, halo + B]`` uint8 with
per-lane ``start_t``/``end_t`` masks, file ids, and 64-bit base offsets.
Each lane's first ``halo`` bytes are stream history (the cross-chunk /
cross-batch match-continuity mechanism replacing ahomatch.cl:42-45 last_state
carry and ahomatch.cl:96-158 overlap continuation).

Ingest paths mirror databuf.c:
- ``add_stream``   <- databuf_add_fd (databuf.c:326-407): raw reads split into
  contiguous B-byte chunks; the tail chunk may be short (masked, not just
  zero-padded — the reference's zero padding can false-match patterns that
  contain 0x00 bytes; masking can't).
- ``add_lines``    <- databuf_add_fp (databuf.c:412-481): line-wise chunks,
  one line (or line fragment, for lines longer than B) per lane; fragments
  are halo-linked so matches spanning fragment boundaries are found (the
  reference loses some of those — "ATTENTION" caveat ahomatch.cl:151-155).
- ``add_chunk``    <- databuf_add_chunk (databuf.c:487-528).

Return codes follow databuf.h:91-94: positive = room left, -1 = chunk-full,
-2 = byte-full (here equivalent to chunk-full; kept for API parity).
"""

from __future__ import annotations

import dataclasses
from typing import BinaryIO

import numpy as np


@dataclasses.dataclass
class StreamState:
    """Continuity state for one input stream (file/FIFO/socket).

    ``tail`` holds the last ``halo`` bytes previously consumed so the next
    chunk can warm the DFA through its prefix; ``offset`` is the absolute
    stream offset of the next byte.
    """

    file_id: int
    offset: int = 0
    tail: bytes = b""
    line_no: int = 0
    in_fragment: bool = False  # previous text line piece had no newline


@dataclasses.dataclass
class HostBatch:
    """One assembled batch, ready for device upload."""

    data: np.ndarray  # [C, halo+B] uint8
    start_t: np.ndarray  # [C] int32
    end_t: np.ndarray  # [C] int32
    file_ids: np.ndarray  # [C] int32
    base_off: np.ndarray  # [C] int64
    chunks: int
    halo: int

    @property
    def payload_bytes(self) -> int:
        return int(np.sum(self.end_t.astype(np.int64)) - self.chunks * self.halo)


class DataBuffer:
    def __init__(self, max_chunks: int, chunk_len: int, halo: int):
        if halo < 0 or chunk_len <= 0 or max_chunks <= 0:
            raise ValueError("bad buffer geometry")
        self.max_chunks = max_chunks
        self.chunk_len = chunk_len
        self.halo = halo
        self._alloc()

    def _alloc(self) -> None:
        C, B, H = self.max_chunks, self.chunk_len, self.halo
        self.data = np.zeros((C, H + B), np.uint8)
        self.start_t = np.full(C, H, np.int32)
        self.end_t = np.full(C, H, np.int32)
        self.file_ids = np.full(C, -1, np.int32)
        self.base_off = np.zeros(C, np.int64)
        self.chunks = 0
        self.bytes = 0

    # ------------------------------------------------------------------ API

    def reset(self) -> None:
        """Reuse the buffer for the next batch (databuf_reset)."""
        C, H = self.max_chunks, self.halo
        if self.chunks:
            self.data[: self.chunks] = 0
            self.start_t[: self.chunks] = H
            self.end_t[: self.chunks] = H
            self.file_ids[: self.chunks] = -1
            self.base_off[: self.chunks] = 0
        self.chunks = 0
        self.bytes = 0

    @property
    def full(self) -> bool:
        return self.chunks >= self.max_chunks

    def _push(self, payload: bytes, stream: StreamState) -> None:
        """Insert one lane: history halo + payload, advance the stream."""
        H, B = self.halo, self.chunk_len
        i = self.chunks
        hist = stream.tail[-H:] if H else b""
        hl = len(hist)
        if hl:
            self.data[i, H - hl : H] = np.frombuffer(hist, np.uint8)
        n = len(payload)
        self.data[i, H : H + n] = np.frombuffer(payload, np.uint8)
        self.start_t[i] = H - hl
        self.end_t[i] = H + n
        self.file_ids[i] = stream.file_id
        self.base_off[i] = stream.offset
        self.chunks += 1
        self.bytes += n
        stream.offset += n
        if H:
            stream.tail = (stream.tail + payload)[-H:]

    def add_stream(self, fobj: BinaryIO, stream: StreamState) -> tuple[int, int]:
        """Binary ingest (databuf_add_fd): fill free lanes with B-byte chunks.

        Returns (code, bytes_read): code > 0 = room remains and stream hit
        EOF for now; -1 = buffer chunk-full; bytes_read = 0 signals EOF.
        """
        rd = 0
        while self.chunks < self.max_chunks:
            payload = fobj.read(self.chunk_len)
            if not payload:
                break
            self._push(payload, stream)
            rd += len(payload)
            if len(payload) < self.chunk_len:
                break  # EOF tail
        code = -1 if self.chunks >= self.max_chunks else (self.max_chunks - self.chunks)
        return code, rd

    def add_lines(self, fobj: BinaryIO, stream: StreamState) -> tuple[int, int, int]:
        """Text ingest (databuf_add_fp): one line (piece) per lane.

        Lines are independent streams — no halo between different lines —
        but pieces of one long line stay halo-linked. Returns
        (code, bytes_read, lines_read).
        """
        rd = 0
        lines = 0
        while self.chunks < self.max_chunks:
            piece = fobj.readline(self.chunk_len)
            if not piece:
                break
            ended = piece.endswith(b"\n")
            if not stream.in_fragment:
                # a fresh line: independent — reset continuity
                stream.tail = b""
                stream.offset = stream.offset  # absolute offsets keep flowing
            self._push(piece, stream)
            rd += len(piece)
            if ended:
                lines += 1
                stream.line_no += 1
                stream.in_fragment = False
            else:
                stream.in_fragment = True
        code = -1 if self.chunks >= self.max_chunks else (self.max_chunks - self.chunks)
        return code, rd, lines

    def add_chunk(
        self, chunk: bytes, stream: StreamState
    ) -> int:
        """Single-chunk insert (databuf_add_chunk). Returns databuf codes."""
        if len(chunk) > self.chunk_len:
            return -3
        if self.chunks >= self.max_chunks:
            return -1
        self._push(chunk, stream)
        return -1 if self.chunks >= self.max_chunks else (self.max_chunks - self.chunks)

    def to_batch(self) -> HostBatch:
        return HostBatch(
            data=self.data,
            start_t=self.start_t,
            end_t=self.end_t,
            file_ids=self.file_ids,
            base_off=self.base_off,
            chunks=self.chunks,
            halo=self.halo,
        )
