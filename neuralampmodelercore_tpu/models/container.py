"""SlimmableContainer: N independent pre-built submodels with ascending
max_value thresholds; runtime sub-model switching.

TPU-native re-implementation of the reference ContainerModel
(reference: NAM/container.{h,cpp}).

On TPU, "switching the active submodel" means switching which compiled
executable the host calls — the analog of the reference's staged
atomic-index swap (container.cpp:99-122). Each submodel is a full Model with
its own jitted step; ``set_slimmable_size`` resets (prewarms) the newly
selected submodel before it becomes active, exactly like the reference
resets before publishing the index.
"""

from __future__ import annotations

import threading
from typing import Any, List, Optional, Tuple

from ..formats import ModelMetadata
from .base import DEFAULT_MAX_BUFFER_SIZE, Model


class SlimmableModelMixin:
    """Interface for runtime size switching (reference: nam::SlimmableModel,
    NAM/slimmable.h:13-29), plus the non-blocking switching machinery
    (reference: the staged atomic-slot swap the audio thread adopts at the
    top of the next process(), NAM/wavenet/slimmable.cpp:309-348,465-498).

    Two ways to keep ``set_slimmable_size`` off the dispatch loop's critical
    path:

      - ``precompile_slimmable_sizes(...)`` builds + compiles + prewarms
        every reachable size up front (they are enumerable from
        ``get_slimmable_size_breakpoints``), so a later synchronous switch
        only re-runs the cached executables (alloc + prewarm steps,
        milliseconds) instead of tracing + compiling (seconds).
      - ``stage_slimmable_size(val)`` does ALL the work (build, compile,
        prewarm) on a background thread while the current size keeps
        serving; ``poll_slimmable_switch()`` — O(microseconds), safe at the
        top of every block — adopts the finished switch and hands back its
        fresh state. This is the exact analog of the reference's staged
        ``shared_ptr`` slot, adapted to the functional explicit-state API.

    Subclasses implement the three hooks ``_resolve_size_key`` /
    ``_build_state_for_key`` / ``_activate_size_key`` plus the two abstract
    interface methods.
    """

    def set_slimmable_size(self, val: float) -> Optional[Any]:
        """Set target size in [0, 1]. Returns a fresh (reset) state for the
        newly active configuration, or None if nothing changed."""
        raise NotImplementedError

    def get_slimmable_size_breakpoints(self) -> List[float]:
        raise NotImplementedError

    # -- per-class hooks ------------------------------------------------------

    def _resolve_size_key(self, val: float):
        """Hashable identity of the size ``val`` maps to."""
        raise NotImplementedError

    def _build_state_for_key(self, key) -> Any:
        """Heavy path: build (if needed) + compile + prewarm the size ``key``
        with the wrapper's current serving geometry; returns its fresh
        state. Must not disturb the currently-active size."""
        raise NotImplementedError

    def _activate_size_key(self, key) -> None:
        raise NotImplementedError

    def _current_size_key(self):
        raise NotImplementedError

    # -- non-blocking switching ----------------------------------------------

    @property
    def _stage_slot(self):
        d = self.__dict__
        if "_stage_lock" not in d:
            d["_stage_lock"] = threading.Lock()
            d["_staged"] = None  # (key, state) ready for adoption
            d["_stage_thread"] = None
        return d

    def _slim_candidate_values(self) -> List[float]:
        """One value per breakpoint segment (midpoints + endpoints) — hits
        every reachable size."""
        edges = [0.0] + sorted(self.get_slimmable_size_breakpoints()) + [1.0]
        vals = [(edges[i] + edges[i + 1]) / 2.0 for i in range(len(edges) - 1)]
        return vals + [0.0, 1.0]

    def precompile_slimmable_sizes(self) -> int:
        """Build + compile + prewarm every reachable size at the current
        serving geometry (the reference's "pre-compile all widths" story,
        SURVEY.md §7 step 7). Returns the number of distinct sizes.
        Call after ``reset(...)`` so the geometry (batch, block size) is the
        serving one — jit caches per shape."""
        keys = []
        for v in self._slim_candidate_values():
            key = self._resolve_size_key(v)
            if key not in keys:
                keys.append(key)
                self._build_state_for_key(key)
        return len(keys)

    def stage_slimmable_size(self, val: float) -> bool:
        """Begin a non-blocking switch to ``val``: the heavy work runs on a
        background thread; the current size keeps serving meanwhile. Returns
        False (nothing staged) when ``val`` maps to the active size and no
        switch is pending. A newer stage supersedes an unadopted older one."""
        slot = self._stage_slot
        key = self._resolve_size_key(val)
        with slot["_stage_lock"]:
            # The newest request always wins: drop any completed-but-unadopted
            # older switch and invalidate any in-flight build.
            slot["_staged"] = None
            slot["_stage_token"] = token = object()
            if key == self._current_size_key():
                return False  # stay at the current size; older stage cancelled

        def work():
            state = self._build_state_for_key(key)
            with slot["_stage_lock"]:
                if slot.get("_stage_token") is token:  # not superseded
                    slot["_staged"] = (key, state)

        t = threading.Thread(target=work, name="nam-slim-stage", daemon=True)
        slot["_stage_thread"] = t
        t.start()
        return True

    def poll_slimmable_switch(self) -> Optional[Any]:
        """Adopt a completed staged switch: activates the staged size and
        returns its fresh state; None while nothing is ready. O(us) — call
        at the top of every block (the reference's process()-top swap,
        slimmable.cpp:465-498)."""
        slot = self._stage_slot
        with slot["_stage_lock"]:
            if slot["_staged"] is None:
                return None
            key, state = slot["_staged"]
            slot["_staged"] = None
        self._activate_size_key(key)
        return state

    def wait_slimmable_switch(self, timeout: Optional[float] = None) -> Optional[Any]:
        """Block until the staged switch finishes, then adopt it (test /
        offline convenience; the dispatch loop should poll instead)."""
        t = self._stage_slot.get("_stage_thread")
        if t is not None:
            t.join(timeout)
        return self.poll_slimmable_switch()


class ContainerModel(SlimmableModelMixin):
    """Fixed 1-in/1-out container of submodels (reference: container.cpp:19-50)."""

    architecture = "SlimmableContainer"

    def __init__(self, submodels: List[Tuple[float, Model]], metadata: ModelMetadata):
        if not submodels:
            raise ValueError("ContainerModel: no submodels provided")
        for i in range(1, len(submodels)):
            if submodels[i][0] <= submodels[i - 1][0]:
                raise ValueError("ContainerModel: submodels must be sorted by ascending max_value")
        if submodels[-1][0] < 1.0:
            raise ValueError("ContainerModel: last submodel max_value must be >= 1.0")
        sr = metadata.sample_rate
        for mv, m in submodels:
            msr = m.expected_sample_rate
            if msr != sr and msr != -1.0 and sr != -1.0:
                raise ValueError(
                    f"ContainerModel: submodel sample rate mismatch (expected {sr}, got {msr})"
                )
        self._submodels = submodels
        self.metadata = metadata
        # Default to full size (last submodel) (reference: container.cpp:48-49).
        self._active_index = len(submodels) - 1
        self._batch = 1
        self._sample_rate: Optional[float] = None
        self._max_buffer_size = DEFAULT_MAX_BUFFER_SIZE

    # -- DSP-alike surface ---------------------------------------------------

    @property
    def num_input_channels(self) -> int:
        return 1  # (reference: container.cpp:20)

    @property
    def num_output_channels(self) -> int:
        return 1

    @property
    def expected_sample_rate(self) -> float:
        return self.metadata.sample_rate

    @property
    def active_index(self) -> int:
        return self._active_index

    @property
    def active_model(self) -> Model:
        return self._submodels[self._active_index][1]

    @property
    def submodels(self) -> List[Tuple[float, Model]]:
        return list(self._submodels)

    @property
    def prewarm_on_reset(self) -> bool:
        return self.active_model.prewarm_on_reset

    @prewarm_on_reset.setter
    def prewarm_on_reset(self, v: bool) -> None:
        # Propagated to all submodels (reference: container.cpp:64-69).
        for _, m in self._submodels:
            m.prewarm_on_reset = v

    def get_prewarm_samples(self) -> int:
        return self.active_model.get_prewarm_samples()

    def reset(self, batch: int = 1, sample_rate: Optional[float] = None,
              max_buffer_size: int = DEFAULT_MAX_BUFFER_SIZE):
        """Reset the ACTIVE submodel only (reference: container.cpp:71-83)."""
        self._batch = batch
        if sample_rate is not None:
            self._sample_rate = sample_rate
        self._max_buffer_size = max_buffer_size
        return self.active_model.reset(batch, sample_rate, max_buffer_size)

    def process(self, x, state):
        return self.active_model.process(x, state)

    def render(self, x, **kw):
        return self.active_model.render(x, **kw)

    # -- slimmable interface -------------------------------------------------

    def _index_for_slimmable_size(self, val: float) -> int:
        """First submodel with val < max_value, else the last
        (reference: container.cpp:85-97)."""
        for i, (mv, _) in enumerate(self._submodels):
            if val < mv:
                return i
        return len(self._submodels) - 1

    def set_slimmable_size(self, val: float) -> Optional[Any]:
        idx = self._index_for_slimmable_size(val)
        if idx == self._active_index:
            return None
        # Reset (prewarm) the newly selected model before activation
        # (reference: container.cpp:116-121).
        state = self._build_state_for_key(idx)
        self._active_index = idx
        return state

    def get_slimmable_size_breakpoints(self) -> List[float]:
        """(reference: container.cpp:124-133)"""
        return [mv for mv, _ in self._submodels[:-1]]

    # -- non-blocking switching hooks (see SlimmableModelMixin) --------------

    def _resolve_size_key(self, val: float) -> int:
        return self._index_for_slimmable_size(val)

    def _build_state_for_key(self, key: int) -> Any:
        model = self._submodels[key][1]
        return model.reset(self._batch, self._sample_rate, self._max_buffer_size)

    def _activate_size_key(self, key: int) -> None:
        self._active_index = key

    def _current_size_key(self) -> int:
        return self._active_index


def load_container(data, load_model_fn) -> ContainerModel:
    """Build from NamData; each submodel is a full .nam spec built recursively
    (reference: ContainerConfig::create, container.cpp:146-169)."""
    submodels_json = data.config.get("submodels")
    if not isinstance(submodels_json, list) or not submodels_json:
        raise ValueError("SlimmableContainer: 'submodels' must be a non-empty array")
    submodels = []
    for entry in submodels_json:
        max_val = float(entry["max_value"])
        submodels.append((max_val, load_model_fn(entry["model"])))
    return ContainerModel(submodels, ModelMetadata.from_nam_data(data))
