"""StreamFarm: the host-side block-streaming dataplane.

The reference is driven by a plugin host calling process() on one stream;
the TPU engine serves thousands of streams per chip, so the host loop itself
becomes a first-class component (SURVEY.md §2.7 "block-streaming scheduler",
§7 hard part #3): per-stream input/output queues, batch assembly into the
engine's (C, T, B) device layout, dispatch, and demux — without becoming the
bottleneck.

Queues are a lock-free native SPSC ring pool whose batch assembly/demux is
fused with the layout transform in one native pass (utils/native.py RingPool
/ native/nam_native.cpp), so audio threads can feed the farm while the
dispatch loop runs.

Dispatch is DOUBLE-BUFFERED: JAX dispatches the device step asynchronously,
so ``dispatch()`` launches block N and then demuxes block N-1's result —
the host's assembly/demux of adjacent blocks overlaps the device's compute
of the current block. The device steps themselves serialize on the carried
ring state (exactly the reference's sequential-process contract,
NAM/dsp.h:97), so this is the maximum available overlap; measured by
tools/bench_farm.py.

    farm = StreamFarm(model, batch=1024, block_size=64)
    farm.start()                      # reset + prewarm
    farm.push(stream_idx, block)      # from audio threads (any subset)
    n = farm.dispatch()               # assemble -> launch step N, demux N-1
    farm.flush()                      # drain the in-flight block
    out = farm.pull(stream_idx)

With pipeline=False every dispatch() is synchronous (launch + demux the same
block) — simpler latency accounting for tiny batches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..models.engine import StreamEngine
from .native import RingPool


class StreamFarm:
    def __init__(self, model, batch: int, block_size: int, queue_depth: int = 8,
                 pipeline: bool = True):
        self.model = model
        self.batch = batch
        self.block_size = block_size
        self.pipeline = pipeline
        if model.num_input_channels != 1 or model.num_output_channels != 1:
            raise ValueError("StreamFarm currently serves mono-in/mono-out models")
        self.engine = StreamEngine(model, batch=batch, block_size=block_size)
        self._in = RingPool(batch, queue_depth, block_size)
        self._out = RingPool(batch, queue_depth, block_size)
        self._state = None
        # TWO assembly buffers, alternated per dispatch: jnp.asarray may
        # alias the host buffer (zero-copy) or transfer it asynchronously,
        # so block N's buffer must stay untouched until step N is known
        # complete. Pipelined dispatch N+1 syncs step N (via _demux's
        # np.asarray) before dispatch N+2 reuses N's buffer, so depth 2 is
        # exactly enough.
        self._assembly = [
            np.zeros((block_size, batch), dtype=np.float32) for _ in range(2)
        ]
        self._abuf = 0
        self._pending: Optional[object] = None  # device y of the in-flight block
        # Output blocks dropped because a stream's output ring was full (the
        # consumer fell behind) — the farm's xrun counter. Audio is real time:
        # when the consumer lags, dropping is the correct behavior, but it
        # must be observable.
        self.dropped = 0

    def start(self) -> None:
        """Allocate + prewarm (the Reset() analog)."""
        self._state = self.engine.reset()

    def push(self, stream: int, block: np.ndarray) -> bool:
        """Producer side: enqueue one block for a stream. Returns False if
        that stream's queue is full (backpressure)."""
        return self._in.push(stream, block)

    def push_range(self, first: int, blocks: np.ndarray) -> int:
        """Bulk producer: (n, T) blocks for streams [first, first+n)."""
        return self._in.push_range(first, blocks)

    def pull(self, stream: int) -> Optional[np.ndarray]:
        """Consumer side: dequeue one processed block for a stream."""
        return self._out.pop(stream)

    def _demux(self, y_device) -> None:
        # np.asarray(y) blocks until the device step is done; with pipeline
        # on, the NEXT step is already dispatched and runs during the demux.
        ok = self._out.push_all_tb(np.asarray(y_device[0]))
        self.dropped += self.batch - ok

    def dispatch(self) -> int:
        """Assemble one batch from the input queues (silent streams get
        zeros) and launch the engine step. In pipelined mode, demuxes the
        PREVIOUS block's output (call flush() to drain the last one); in
        sync mode, demuxes this block's. Returns the number of streams that
        had real input this block."""
        if self._state is None:
            raise RuntimeError("StreamFarm.dispatch before start()")
        buf = self._assembly[self._abuf]
        self._abuf ^= 1
        fed = self._in.pop_all_tb(buf)
        x = jnp.asarray(buf)[None]  # (1, T, B), async device put
        y, self._state = self.engine.step_fn()(self.engine.params, self._state, x)
        if self.pipeline:
            prev, self._pending = self._pending, y
            if prev is not None:
                self._demux(prev)
        else:
            self._demux(y)
        return fed

    def flush(self) -> None:
        """Drain the in-flight block (pipelined mode)."""
        if self._pending is not None:
            prev, self._pending = self._pending, None
            self._demux(prev)

    def run(self, num_blocks: int) -> None:
        for _ in range(num_blocks):
            self.dispatch()
        self.flush()
