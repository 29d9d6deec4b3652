"""StreamFarm: the host-side block-streaming dataplane.

The reference is driven by a plugin host calling process() on one stream;
the TPU engine serves thousands of streams per chip, so the host loop itself
becomes a first-class component (SURVEY.md §2.7 "block-streaming scheduler",
§7 hard part #3): per-stream input feeds, batch assembly into the engine's
(C, T, B) device layout, dispatch, and demux — without becoming the
bottleneck.

Round 4 replaced the RingPool gather/scatter dataplane with the EPOCH
MAILBOX (utils/native.py Mailbox / native/nam_native.cpp "Epoch mailbox"):
round 3 measured the fused assembly+demux passes at 5.6 ms/block on the
single dispatch thread at B=4096/T=128 — over the 2.67 ms audio deadline
(BENCH_r03.json). The mailbox removes that work from the dispatch thread
architecturally:

  - producers (audio threads) write blocks DIRECTLY into the (C, T, B)
    device-layout slab for the epoch they target — the layout transform
    rides the many producer threads, where it parallelizes;
  - silent streams cost the host nothing: dispatch scans per-cell epoch
    flags into a B-float {0,1} mask and the DEVICE multiplies it into the
    input (stale column data is finite old audio, so masked columns are
    exact zeros — bit-identical to the old host-zeroed assembly);
  - demux is publication: the fetched (C_out*T, B) output array is handed
    to consumers by reference; each consumer gathers its own column.

Dispatch stays DOUBLE-BUFFERED: JAX dispatches the device step
asynchronously, so ``dispatch()`` launches block N and then publishes block
N-1's result — the host's (now tiny) per-block work overlaps the device's
compute. The device steps serialize on the carried ring state (exactly the
reference's sequential-process contract, NAM/dsp.h:97).

    farm = StreamFarm(model, batch=4096, block_size=128)
    farm.start()                      # reset + prewarm
    farm.push(stream_idx, block)      # from audio threads (any subset)
    n = farm.dispatch()               # mask-scan -> launch N, publish N-1
    farm.flush()                      # drain the in-flight block
    out = farm.pull(stream_idx)

With pipeline=False every dispatch() is synchronous. Multichannel models
stream (C_in, T) blocks in and (C_out, T) blocks out; mono models use flat
(T,) blocks.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.engine import StreamEngine
from .native import Mailbox


class StreamFarm:
    def __init__(self, model, batch: int, block_size: int, queue_depth: int = 8,
                 pipeline: bool = True):
        self.model = model
        self.batch = batch
        self.block_size = block_size
        self.pipeline = pipeline
        self.cin = model.num_input_channels
        self.cout = model.num_output_channels
        self.engine = StreamEngine(model, batch=batch, block_size=block_size)
        self._mbox = Mailbox(batch, queue_depth, self.cin * block_size)
        self.depth = self._mbox.depth
        self._state = None
        self._epoch = 0
        # Masked step: the engine step with the mailbox's fed-mask multiplied
        # into the input ON DEVICE — the host never zeroes silent columns.
        raw = self.engine.step_fn().__wrapped__
        # jnp.where, not x*m: a producer pushing a non-finite sample must not
        # poison a MASKED column (0 * NaN = NaN would persist through
        # recurrent state); where() gives exact zeros regardless of slab
        # contents — bit-identical to the old host-zeroed assembly.
        self._masked_step = jax.jit(
            lambda p, s, x, m: raw(
                p, s, jnp.where(m[None, None, :] != 0, x, jnp.zeros((), x.dtype))
            ),
            donate_argnums=(1,),
        )
        # TWO mask staging buffers, alternated per dispatch: jnp.asarray may
        # transfer asynchronously, so epoch N's mask must stay untouched
        # until step N is enqueued with it; publish of N-1 syncs step N-1
        # before N+1 reuses its buffer.
        self._masks = [np.zeros(batch, np.float32) for _ in range(2)]
        # Published outputs: epoch -> (C_out*T, B) numpy array, a sliding
        # window of the last `depth` epochs. Consumers (audio threads) read
        # this window concurrently with the dispatch thread's publish;
        # `_out_lock` guards the window so pull() can never observe a key
        # being deleted between its bounds check and the indexing. The lock
        # holds only dict bookkeeping (ns-scale) — the column gather runs
        # outside it on the grabbed array reference, which is immutable
        # after publication.
        self._out: Dict[int, np.ndarray] = {}
        self._out_lock = threading.Lock()
        self._cursor = np.zeros(batch, np.int64)  # per-consumer next epoch
        self._pending: Optional[Tuple[int, object]] = None  # in-flight (epoch, y)
        # Blocks a consumer missed because it lagged more than `depth`
        # epochs behind — the farm's xrun counter. Audio is real time: when
        # the consumer lags, skipping forward is the correct behavior, but
        # it must be observable.
        self.dropped = 0

    def start(self) -> None:
        """Allocate + prewarm (the Reset() analog)."""
        self._state = self.engine.reset()

    def push(self, stream: int, block: np.ndarray) -> bool:
        """Producer side: write one block — (T,) mono or (C_in, T) — for a
        stream into the current epoch's slab. Returns False only if the
        mailbox is full (producer ran ahead of dispatch by `depth` blocks)."""
        return self._mbox.push(stream, block) >= 0

    def push_range(self, first: int, blocks: np.ndarray) -> int:
        """Bulk producer: (n, T) or (n, C_in, T) blocks for streams
        [first, first+n)."""
        blocks = np.ascontiguousarray(blocks, np.float32)
        return self._mbox.push_range(first, blocks.reshape(blocks.shape[0], -1))

    def _publish(self, epoch: int, y_device) -> None:
        # np.asarray(y) blocks until the device step is done; with pipeline
        # on, the NEXT step is already dispatched and runs during the fetch.
        y = np.asarray(y_device).reshape(self.cout * self.block_size, self.batch)
        with self._out_lock:
            self._out[epoch] = y
            self._out.pop(epoch - self.depth, None)
        # The device is done reading epoch's input slab: producers may reuse.
        self._mbox.mark_consumed(epoch)

    def dispatch(self) -> int:
        """Scan the current epoch's fill flags into the device mask, launch
        the engine step on the epoch's slab, and (pipelined) publish the
        PREVIOUS block's output. Returns the number of streams that had real
        input this block."""
        if self._state is None:
            raise RuntimeError("StreamFarm.dispatch before start()")
        e = self._epoch
        mask = self._masks[e & 1]
        fed = self._mbox.assemble(e, mask)
        x = jnp.asarray(self._mbox.slab(e)).reshape(
            self.cin, self.block_size, self.batch
        )
        y, self._state = self._masked_step(
            self.engine.params, self._state, x, jnp.asarray(mask)
        )
        self._epoch = e + 1
        if self.pipeline:
            prev, self._pending = self._pending, (e, y)
            if prev is not None:
                self._publish(*prev)
        else:
            self._publish(e, y)
        return fed

    def flush(self) -> None:
        """Drain the in-flight block (pipelined mode)."""
        if self._pending is not None:
            prev, self._pending = self._pending, None
            self._publish(*prev)

    def pull(self, stream: int) -> Optional[np.ndarray]:
        """Consumer side: the stream's next processed block — (T,) mono or
        (C_out, T) — or None if not yet published. A consumer more than
        `depth` blocks behind skips forward (counted in ``dropped``)."""
        with self._out_lock:
            if not self._out:
                return None
            newest = max(self._out)
            oldest = min(self._out)
            cur = int(self._cursor[stream])
            if cur < oldest:
                self.dropped += oldest - cur
                cur = oldest
            if cur > newest:
                return None
            block = self._out[cur]
        out = self._mbox.gather(block, stream)
        self._cursor[stream] = cur + 1
        if self.cout > 1:
            return out.reshape(self.cout, self.block_size)
        return out

    def run(self, num_blocks: int) -> None:
        for _ in range(num_blocks):
            self.dispatch()
        self.flush()
