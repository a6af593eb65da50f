"""Native-accelerated frame transport: ctypes bindings for runtime/ghost_rt.

Provides the host half of the double-buffered host->HBM frame queue:
a lock-free SPSC ring of fixed-size frame slots (decode thread pushes,
device feeder pops) plus fused uint8<->float conversion kernels. Falls
back to numpy + queue.Queue when the native library is unavailable, so
the framework runs anywhere; the native path is auto-built on first use
when g++ is present.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_RT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "runtime")
_LIB_PATH = os.path.abspath(os.path.join(_RT_DIR, "libghost_rt.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_RT_DIR)],
                           capture_output=True, check=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.gr_ring_create.restype = ctypes.c_void_p
    lib.gr_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.gr_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.gr_ring_try_push.restype = ctypes.c_int
    lib.gr_ring_try_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_int64]
    lib.gr_ring_try_pop.restype = ctypes.c_int
    lib.gr_ring_try_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int64]
    lib.gr_ring_size.restype = ctypes.c_int64
    lib.gr_ring_size.argtypes = [ctypes.c_void_p]
    lib.gr_u8_to_f32_affine.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def u8_to_pm1(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1,1] via the native kernel when available."""
    lib = _load_lib()
    out = np.empty(frames_u8.shape, np.float32)
    if lib is not None and frames_u8.flags["C_CONTIGUOUS"]:
        lib.gr_u8_to_f32_affine(
            frames_u8.ctypes.data_as(ctypes.c_char_p),
            out.ctypes.data,
            frames_u8.size,
            ctypes.c_float(1.0 / 127.5),
            ctypes.c_float(-1.0),
        )
        return out
    return frames_u8.astype(np.float32) / 127.5 - 1.0


class FrameRing:
    """SPSC ring of fixed-shape uint8 frames (native or Queue fallback)."""

    def __init__(self, frame_shape: tuple, slots: int = 8):
        self.frame_shape = tuple(frame_shape)
        self.nbytes = int(np.prod(frame_shape))
        self._lib = _load_lib()
        if self._lib is not None:
            self._ring = self._lib.gr_ring_create(slots, self.nbytes)
            if not self._ring:
                self._lib = None
        if self._lib is None:
            self._q: queue.Queue = queue.Queue(maxsize=slots)
        self._closed = threading.Event()

    def push(self, frame: np.ndarray, timeout: float = 10.0) -> bool:
        frame = np.ascontiguousarray(frame, np.uint8)
        if self._lib is not None:
            import time

            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                if self._lib.gr_ring_try_push(
                    self._ring, frame.ctypes.data_as(ctypes.c_char_p),
                    self.nbytes,
                ):
                    return True
                time.sleep(0.0005)
            return False
        try:
            self._q.put(frame, timeout=timeout)
            return True
        except queue.Full:
            return False

    def pop(self, timeout: float = 10.0) -> Optional[np.ndarray]:
        if self._lib is not None:
            import time

            out = np.empty(self.frame_shape, np.uint8)
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                if self._lib.gr_ring_try_pop(
                    self._ring, out.ctypes.data_as(ctypes.c_char_p), self.nbytes
                ):
                    return out
                if self._closed.is_set() and self.size() == 0:
                    return None
                time.sleep(0.0005)
            return None
        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            return None

    def size(self) -> int:
        if self._lib is not None:
            return int(self._lib.gr_ring_size(self._ring))
        return self._q.qsize()

    def drained(self) -> bool:
        """True only when the producer closed the ring AND every frame
        has been popped — the one condition that means end-of-stream
        (a pop timeout alone is a stall, not EOF)."""
        return self._closed.is_set() and self.size() == 0

    def close(self):
        self._closed.set()

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_ring", None):
            self._lib.gr_ring_destroy(self._ring)
            self._ring = None


def stream_video_chunks(path: str, chunk_size: int,
                        slots: int = 4) -> Iterator[np.ndarray]:
    """Decode-on-thread video chunk iterator: cv2 decode runs in a
    producer thread pushing into the ring while the consumer feeds the
    device — the host half of the double-buffered frame queue."""
    import cv2

    cap = cv2.VideoCapture(path)
    ok, first = cap.read()
    if not ok:
        cap.release()
        return
    h, w = first.shape[:2]
    ring = FrameRing((h, w, 3), slots=slots * chunk_size)

    def producer():
        ring.push(first[:, :, ::-1])
        while True:
            ok2, frame = cap.read()
            if not ok2:
                break
            if not ring.push(frame[:, :, ::-1], timeout=30.0):
                break
        cap.release()
        ring.close()

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    buf = []
    while True:
        f = ring.pop(timeout=30.0)
        if f is None:
            # only a closed-and-drained ring is EOF; a timeout with the
            # decode thread still alive is a stall and must not
            # silently truncate the video
            if ring.drained():
                break
            if not t.is_alive():
                break
            continue  # producer alive: keep waiting
        buf.append(f)
        if len(buf) == chunk_size:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)
    t.join(timeout=5.0)
