"""StreamFarm: the host-side block-streaming dataplane.

The reference is driven by a plugin host calling process() on one stream;
the TPU engine serves thousands of streams per chip, so the host loop itself
becomes a first-class component (SURVEY.md §2.7 "block-streaming scheduler",
§7 hard part #3): per-stream input/output queues, batch assembly into the
engine's (C, T, B) device layout, dispatch, and demux — without becoming the
bottleneck.

Queues are lock-free native SPSC rings and the batch (de)interleave runs in
the native dataplane library when built (utils/native.py), so audio threads
can feed the farm while the dispatch loop runs.

    farm = StreamFarm(model, batch=1024, block_size=64)
    farm.start()                      # reset + prewarm
    farm.push(stream_idx, block)      # from audio threads (any subset)
    n = farm.dispatch()               # assemble -> engine step -> demux
    out = farm.pull(stream_idx)
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..models.engine import StreamEngine
from .native import BlockRing, transpose_bt_tb, transpose_tb_bt


class StreamFarm:
    def __init__(self, model, batch: int, block_size: int, queue_depth: int = 8):
        self.model = model
        self.batch = batch
        self.block_size = block_size
        if model.num_input_channels != 1 or model.num_output_channels != 1:
            raise ValueError("StreamFarm currently serves mono-in/mono-out models")
        self.engine = StreamEngine(model, batch=batch, block_size=block_size)
        self._in: List[BlockRing] = [BlockRing(queue_depth, block_size) for _ in range(batch)]
        self._out: List[BlockRing] = [BlockRing(queue_depth, block_size) for _ in range(batch)]
        self._state = None
        self._assembly = np.zeros((batch, block_size), dtype=np.float32)
        self._pending: Optional[object] = None  # (y_device,) awaiting demux

    def start(self) -> None:
        """Allocate + prewarm (the Reset() analog)."""
        self._state = self.engine.reset()

    def push(self, stream: int, block: np.ndarray) -> bool:
        """Producer side: enqueue one block for a stream. Returns False if
        that stream's queue is full (backpressure)."""
        return self._in[stream].push(np.asarray(block, dtype=np.float32))

    def pull(self, stream: int) -> Optional[np.ndarray]:
        """Consumer side: dequeue one processed block for a stream."""
        return self._out[stream].pop()

    def dispatch(self) -> int:
        """Assemble one batch from the input queues (silent streams get
        zeros), run the engine step, and demux outputs to the output queues.
        Returns the number of streams that had real input this block."""
        if self._state is None:
            raise RuntimeError("StreamFarm.dispatch before start()")
        fed = 0
        a = self._assembly
        for i, ring in enumerate(self._in):
            blk = ring.pop()
            if blk is None:
                a[i] = 0.0
            else:
                a[i] = blk
                fed += 1
        # host->device layout: (B, T) -> (T, B) native transpose -> (1, T, B)
        x = jnp.asarray(transpose_bt_tb(a))[None]
        y, self._state = self.engine.step_fn()(self.engine.params, self._state, x)
        out = transpose_tb_bt(np.asarray(y[0]))  # (B, T)
        for i, ring in enumerate(self._out):
            ring.push(out[i])
        return fed

    def run(self, num_blocks: int) -> None:
        for _ in range(num_blocks):
            self.dispatch()
