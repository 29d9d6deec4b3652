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

from typing import Any, List, Optional, Tuple

from ..formats import ModelMetadata
from .base import DEFAULT_MAX_BUFFER_SIZE, Model


class SlimmableModelMixin:
    """Interface for runtime size switching (reference: nam::SlimmableModel,
    NAM/slimmable.h:13-29)."""

    def set_slimmable_size(self, val: float) -> Optional[Any]:
        """Set target size in [0, 1]. Returns a fresh (reset) state for the
        newly active configuration, or None if nothing changed."""
        raise NotImplementedError

    def get_slimmable_size_breakpoints(self) -> List[float]:
        raise NotImplementedError


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
        model = self._submodels[idx][1]
        state = model.reset(self._batch, self._sample_rate, self._max_buffer_size)
        self._active_index = idx
        return state

    def get_slimmable_size_breakpoints(self) -> List[float]:
        """(reference: container.cpp:124-133)"""
        return [mv for mv, _ in self._submodels[:-1]]


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
