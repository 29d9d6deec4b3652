"""ctypes bindings for the native host dataplane (native/nam_native.cpp).

Builds the shared library on demand (g++ is assumed present; the build is a
single translation unit). Every entry point has a NumPy fallback so the
package works without a compiler; ``have_native()`` reports which path is
active. See native/nam_native.cpp for the design rationale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnam_native.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_attempted = False


ABI_VERSION = 3  # keep in sync with nam_native_abi_version()


def _needs_rebuild() -> bool:
    """Decide staleness WITHOUT dlopen: glibc caches dlopen by pathname, so
    probing a stale library here would make the post-rebuild CDLL() below
    return the already-mapped stale image for the rest of the process (the
    ABI check would then fail forever despite a good build on disk).
    Instead scan the file for the embedded ABI marker string
    (nam_native_abi_marker in native/nam_native.cpp)."""
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        with open(_LIB_PATH, "rb") as f:
            return f"NAM_NATIVE_ABI={ABI_VERSION}".encode() not in f.read()
    except OSError:
        return True


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _needs_rebuild() and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-sB", "lib"],
                    cwd=os.path.abspath(_NATIVE_DIR),
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                # Rebuild failed (e.g. no compiler). The on-disk library may
                # still be ABI-correct even though the marker scan flagged it
                # (built from pre-marker source): fall through to the CDLL
                # load and let nam_native_abi_version() below decide.
                pass
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        try:
            return _bind_and_check(lib)
        except AttributeError:
            # Pre-marker/pre-pool binary whose rebuild failed: missing
            # symbols mean stale ABI — use the numpy fallbacks.
            return None


def _bind_and_check(lib: ctypes.CDLL) -> Optional[ctypes.CDLL]:
    global _lib
    # signatures
    i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    lib.nam_transpose_bt_tb.argtypes = [f32p, i64, i64, f32p]
    lib.nam_transpose_tb_bt.argtypes = [f32p, i64, i64, f32p]
    lib.nam_decode_pcm16.argtypes = [ctypes.POINTER(ctypes.c_int16), i64, f32p]
    lib.nam_decode_pcm24.argtypes = [ctypes.POINTER(ctypes.c_uint8), i64, f32p]
    lib.nam_decode_pcm32.argtypes = [ctypes.POINTER(ctypes.c_int32), i64, f32p]
    lib.nam_encode_pcm16.argtypes = [f32p, i64, ctypes.POINTER(ctypes.c_int16)]
    lib.nam_ring_create.restype = ctypes.c_void_p
    lib.nam_ring_create.argtypes = [i64, i64]
    lib.nam_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.nam_ring_size.restype = i64
    lib.nam_ring_size.argtypes = [ctypes.c_void_p]
    lib.nam_ring_push.restype = ctypes.c_int
    lib.nam_ring_push.argtypes = [ctypes.c_void_p, f32p]
    lib.nam_ring_pop.restype = ctypes.c_int
    lib.nam_ring_pop.argtypes = [ctypes.c_void_p, f32p]
    lib.nam_pool_create.restype = ctypes.c_void_p
    lib.nam_pool_create.argtypes = [i64, i64, i64]
    lib.nam_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.nam_pool_size.restype = i64
    lib.nam_pool_size.argtypes = [ctypes.c_void_p, i64]
    lib.nam_pool_push.restype = ctypes.c_int
    lib.nam_pool_push.argtypes = [ctypes.c_void_p, i64, f32p]
    lib.nam_pool_pop.restype = ctypes.c_int
    lib.nam_pool_pop.argtypes = [ctypes.c_void_p, i64, f32p]
    lib.nam_pool_push_range.restype = i64
    lib.nam_pool_push_range.argtypes = [ctypes.c_void_p, i64, i64, f32p]
    lib.nam_pool_pop_all_tb.restype = i64
    lib.nam_pool_pop_all_tb.argtypes = [ctypes.c_void_p, f32p]
    lib.nam_pool_push_all_tb.restype = i64
    lib.nam_pool_push_all_tb.argtypes = [ctypes.c_void_p, f32p]
    lib.nam_mbox_create.restype = ctypes.c_void_p
    lib.nam_mbox_create.argtypes = [i64, i64, i64]
    lib.nam_mbox_destroy.argtypes = [ctypes.c_void_p]
    lib.nam_mbox_slab_ptr.restype = f32p
    lib.nam_mbox_slab_ptr.argtypes = [ctypes.c_void_p, i64]
    lib.nam_mbox_push.restype = i64
    lib.nam_mbox_push.argtypes = [ctypes.c_void_p, i64, f32p]
    lib.nam_mbox_push_range.restype = i64
    lib.nam_mbox_push_range.argtypes = [ctypes.c_void_p, i64, i64, f32p]
    lib.nam_mbox_assemble.restype = i64
    lib.nam_mbox_assemble.argtypes = [ctypes.c_void_p, i64, f32p]
    lib.nam_mbox_mark_consumed.argtypes = [ctypes.c_void_p, i64]
    lib.nam_mbox_next_epoch.restype = i64
    lib.nam_mbox_next_epoch.argtypes = [ctypes.c_void_p]
    lib.nam_mbox_gather.argtypes = [f32p, i64, i64, i64, f32p]
    lib.nam_native_abi_version.restype = ctypes.c_int
    if lib.nam_native_abi_version() != ABI_VERSION:
        return None  # stale library and rebuild failed: use numpy fallbacks
    _lib = lib
    return _lib


def have_native() -> bool:
    return _try_load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def transpose_bt_tb(x: np.ndarray) -> np.ndarray:
    """(B, T) float32 -> (T, B): the host->device layout transform for the
    engine's (C=1, T, B) input."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    b, t = x.shape
    lib = _try_load()
    out = np.empty((t, b), dtype=np.float32)
    if lib is None:
        out[...] = x.T
        return out
    lib.nam_transpose_bt_tb(_fptr(x), b, t, _fptr(out))
    return out


def transpose_tb_bt(x: np.ndarray) -> np.ndarray:
    """(T, B) float32 -> (B, T): device->host output transform."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    t, b = x.shape
    lib = _try_load()
    out = np.empty((b, t), dtype=np.float32)
    if lib is None:
        out[...] = x.T
        return out
    lib.nam_transpose_tb_bt(_fptr(x), b, t, _fptr(out))
    return out


def decode_pcm(raw: bytes, bits: int) -> np.ndarray:
    """PCM bytes -> float32 in [-1, 1] (native fast path)."""
    lib = _try_load()
    if bits == 16:
        src = np.frombuffer(raw, dtype="<i2")
        if lib is None:
            return src.astype(np.float32) / 32768.0
        out = np.empty(src.size, np.float32)
        lib.nam_decode_pcm16(src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), src.size, _fptr(out))
        return out
    if bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8)
        n = b.size // 3
        if lib is None:
            b3 = b.reshape(-1, 3)
            vals = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            return vals.astype(np.float32) / float(1 << 23)
        out = np.empty(n, np.float32)
        lib.nam_decode_pcm24(b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, _fptr(out))
        return out
    if bits == 32:
        src = np.frombuffer(raw, dtype="<i4")
        if lib is None:
            return (src.astype(np.float64) / float(1 << 31)).astype(np.float32)
        out = np.empty(src.size, np.float32)
        lib.nam_decode_pcm32(src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), src.size, _fptr(out))
        return out
    raise ValueError(f"unsupported PCM bit depth {bits}")


class BlockRing:
    """Lock-free SPSC ring of fixed-size float blocks (native; numpy-deque
    fallback). The host-side block queue between audio threads and the device
    dispatch loop."""

    def __init__(self, capacity: int, block_len: int):
        self.block_len = int(block_len)
        self._lib = _try_load()
        if self._lib is not None:
            self._h = self._lib.nam_ring_create(int(capacity), int(block_len))
            self._q = None
        else:
            from collections import deque

            self._h = None
            self._q = deque(maxlen=None)
            self._capacity = int(capacity)

    def push(self, block: np.ndarray) -> bool:
        block = np.ascontiguousarray(block, dtype=np.float32).reshape(-1)
        assert block.size == self.block_len
        if self._h is not None:
            return bool(self._lib.nam_ring_push(self._h, _fptr(block)))
        if len(self._q) >= self._capacity:
            return False
        self._q.append(block.copy())
        return True

    def pop(self) -> Optional[np.ndarray]:
        if self._h is not None:
            out = np.empty(self.block_len, np.float32)
            if self._lib.nam_ring_pop(self._h, _fptr(out)):
                return out
            return None
        if not self._q:
            return None
        return self._q.popleft()

    def __len__(self) -> int:
        if self._h is not None:
            return int(self._lib.nam_ring_size(self._h))
        return len(self._q)

    def __del__(self):
        try:
            if getattr(self, "_h", None) is not None:
                self._lib.nam_ring_destroy(self._h)
                self._h = None
        except Exception:
            pass


class RingPool:
    """Per-stream SPSC ring pool with fused batch assembly/demux: the farm's
    hot path gathers one block per stream directly into the engine's (T, B)
    device layout (and scatters back) in one native pass, instead of a
    Python pop-loop plus a separate transpose. Falls back to numpy rings."""

    def __init__(self, n_streams: int, capacity: int, block_len: int):
        self.n_streams = int(n_streams)
        self.block_len = int(block_len)
        self._lib = _try_load()
        if self._lib is not None:
            self._h = self._lib.nam_pool_create(self.n_streams, int(capacity), self.block_len)
            self._rings = None
        else:
            self._h = None
            self._rings = [BlockRing(capacity, block_len) for _ in range(self.n_streams)]

    def push(self, stream: int, block: np.ndarray) -> bool:
        block = np.ascontiguousarray(block, dtype=np.float32).reshape(-1)
        assert block.size == self.block_len
        if self._h is not None:
            return bool(self._lib.nam_pool_push(self._h, int(stream), _fptr(block)))
        return self._rings[stream].push(block)

    def push_range(self, first: int, blocks: np.ndarray) -> int:
        """blocks: (n, T) for streams [first, first+n). Returns #accepted."""
        blocks = np.ascontiguousarray(blocks, dtype=np.float32)
        if self._h is not None:
            return int(self._lib.nam_pool_push_range(self._h, int(first), blocks.shape[0], _fptr(blocks)))
        return sum(self._rings[first + i].push(blocks[i]) for i in range(blocks.shape[0]))

    def pop(self, stream: int) -> Optional[np.ndarray]:
        if self._h is not None:
            out = np.empty(self.block_len, np.float32)
            if self._lib.nam_pool_pop(self._h, int(stream), _fptr(out)):
                return out
            return None
        return self._rings[stream].pop()

    def pop_all_tb(self, out_tb: np.ndarray) -> int:
        """Pop one block per stream into (T, B) layout (zeros when empty).
        Returns the number of streams that had input."""
        if (
            out_tb.shape != (self.block_len, self.n_streams)
            or out_tb.dtype != np.float32
            or not out_tb.flags.c_contiguous
        ):
            # Explicit raise (not assert: stripped under python -O): the
            # native path writes through the raw data pointer assuming a
            # dense row-major (T, B) buffer; a strided view would be
            # silently corrupted, not filled.
            raise ValueError("pop_all_tb needs a C-contiguous float32 (T, B) buffer")
        if self._h is not None:
            return int(self._lib.nam_pool_pop_all_tb(self._h, _fptr(out_tb)))
        fed = 0
        for i, r in enumerate(self._rings):
            blk = r.pop()
            if blk is None:
                out_tb[:, i] = 0.0
            else:
                out_tb[:, i] = blk
                fed += 1
        return fed

    def push_all_tb(self, in_tb: np.ndarray) -> int:
        """Scatter a (T, B) result into the per-stream rings."""
        in_tb = np.ascontiguousarray(in_tb, dtype=np.float32)
        assert in_tb.shape == (self.block_len, self.n_streams)
        if self._h is not None:
            return int(self._lib.nam_pool_push_all_tb(self._h, _fptr(in_tb)))
        ok = 0
        for i, r in enumerate(self._rings):
            ok += r.push(np.ascontiguousarray(in_tb[:, i]))
        return ok

    def size(self, stream: int) -> int:
        if self._h is not None:
            return int(self._lib.nam_pool_size(self._h, int(stream)))
        return len(self._rings[stream])

    def __del__(self):
        try:
            if getattr(self, "_h", None) is not None:
                self._lib.nam_pool_destroy(self._h)
                self._h = None
        except Exception:
            pass


class Mailbox:
    """Epoch mailbox: the zero-copy farm dataplane (native/nam_native.cpp
    "Epoch mailbox" section for the design and memory-ordering rationale).

    Producers write blocks directly into the device-layout slab for the
    epoch they target (the layout transform rides the producer threads);
    dispatch turns per-cell fill flags into a {0,1} mask the DEVICE
    multiplies in, so silent streams cost the host nothing; consumers
    gather their column from published output arrays.

    NumPy fallback: same protocol under the GIL (single-interpreter safety
    is enough for tests; the native path is the production one).
    """

    def __init__(self, n_streams: int, depth: int, block_floats: int):
        self.n_streams = int(n_streams)
        self.block_floats = int(block_floats)
        d = 1
        while d < int(depth):
            d <<= 1
        self.depth = d
        self._lib = _try_load()
        if self._lib is not None:
            self._h = self._lib.nam_mbox_create(self.n_streams, self.depth, self.block_floats)
            ptr = self._lib.nam_mbox_slab_ptr(self._h, 0)
            self.slabs = np.ctypeslib.as_array(
                ptr, shape=(self.depth, self.block_floats, self.n_streams)
            )
        else:
            self._h = None
            self.slabs = np.zeros((self.depth, self.block_floats, self.n_streams), np.float32)
            self._filled = np.full((self.depth, self.n_streams), -1, np.int64)
            self._seq = np.zeros(self.n_streams, np.int64)
            self._next_epoch = 0
            self._consumed = -1

    def push(self, stream: int, block: np.ndarray) -> int:
        """Write one block (block_floats values) for a stream into its
        column of the target epoch's slab. Returns the epoch delivered to,
        or -1 if the mailbox is full."""
        block = np.ascontiguousarray(block, dtype=np.float32).reshape(-1)
        assert block.size == self.block_floats
        if self._h is not None:
            return int(self._lib.nam_mbox_push(self._h, int(stream), _fptr(block)))
        e = max(int(self._seq[stream]), self._next_epoch)
        if e - self._consumed > self.depth - 1:
            return -1
        self.slabs[e % self.depth, :, stream] = block
        self._filled[e % self.depth, stream] = e
        self._seq[stream] = e + 1
        return e

    def push_range(self, first: int, blocks: np.ndarray) -> int:
        """(n, block_floats) blocks for streams [first, first+n)."""
        blocks = np.ascontiguousarray(blocks, dtype=np.float32)
        if self._h is not None:
            return int(
                self._lib.nam_mbox_push_range(self._h, int(first), blocks.shape[0], _fptr(blocks))
            )
        return sum(self.push(first + i, blocks[i]) >= 0 for i in range(blocks.shape[0]))

    def assemble(self, epoch: int, mask_out: np.ndarray) -> int:
        """Scan epoch's fill flags into a {0,1} float mask; returns #fed."""
        assert mask_out.shape == (self.n_streams,) and mask_out.dtype == np.float32
        if self._h is not None:
            return int(self._lib.nam_mbox_assemble(self._h, int(epoch), _fptr(mask_out)))
        self._next_epoch = epoch + 1
        hit = self._filled[epoch % self.depth] == epoch
        mask_out[:] = hit
        return int(hit.sum())

    def slab(self, epoch: int) -> np.ndarray:
        """(block_floats, n_streams) view of the epoch's slab (no copy)."""
        return self.slabs[epoch % self.depth]

    def mark_consumed(self, epoch: int) -> None:
        """The device step that read this epoch's slab is complete."""
        if self._h is not None:
            self._lib.nam_mbox_mark_consumed(self._h, int(epoch))
        else:
            self._consumed = epoch

    def next_epoch(self) -> int:
        if self._h is not None:
            return int(self._lib.nam_mbox_next_epoch(self._h))
        return self._next_epoch

    def gather(self, out_tb: np.ndarray, stream: int) -> np.ndarray:
        """Consumer-side column gather from a published (F, B) output."""
        out = np.empty(out_tb.shape[0], np.float32)
        if self._lib is not None and out_tb.flags.c_contiguous and out_tb.dtype == np.float32:
            self._lib.nam_mbox_gather(
                _fptr(out_tb), out_tb.shape[1], out_tb.shape[0], int(stream), _fptr(out)
            )
            return out
        out[:] = out_tb[:, stream]
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None) is not None:
                self.slabs = None  # view into native memory: drop before free
                self._lib.nam_mbox_destroy(self._h)
                self._h = None
        except Exception:
            pass
