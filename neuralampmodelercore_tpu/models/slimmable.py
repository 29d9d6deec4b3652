"""SlimmableWavenet: runtime channel-width switching for WaveNet.

TPU-native re-implementation of the reference SlimmableWavenet
(reference: NAM/wavenet/slimmable.{h,cpp}).

The reference stores the full parsed params + flat weight stream; on
``SetSlimmableSize`` it maps the ratio to per-array channel counts, extracts a
weight subset by walking the full flat stream in exact ``set_weights_`` order
(slimmable.cpp:128-261), rebuilds a fresh WaveNet, and stages it for an atomic
swap. Here the weight extraction is replicated *at the flat-stream level* —
including the first-rows/first-cols slicing of every conv and FiLM — so the
slimmed model is weight-for-weight identical to the reference's; the rebuilt
model then goes through the standard WaveNet build path. "Staged swap" on TPU
means compiling/caching one jitted step per width and switching which one the
host calls; previously-built widths are cached so switching back is instant.

Restrictions mirror the reference: groups must be 1 everywhere, head rechannel
kernel_size must be 1, and post-stack head is unsupported
(slimmable.cpp:87-98, 139-145, 394-395).
"""

from __future__ import annotations

import copy
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .. import registry
from ..formats import ModelMetadata, NamData
from .base import DEFAULT_MAX_BUFFER_SIZE, Model
from .container import SlimmableModelMixin
from .wavenet import NONE, WaveNetConfig


SLIMMABLE_METHOD = "slice_channels_uniform"


def config_is_slimmable_wavenet(config: dict) -> bool:
    """(reference: config_is_slimmable_wavenet, NAM/wavenet/model.cpp:1212-1230)"""
    layers = config.get("layers")
    if not isinstance(layers, list):
        return False
    for lc in layers:
        s = lc.get("slimmable")
        if not isinstance(s, dict):
            continue
        method = s.get("method", "")
        if method != SLIMMABLE_METHOD:
            if method:
                raise ValueError(f"SlimmableWavenet: unsupported slimmable method '{method}'")
            continue
        return True
    return False


def _ratio_to_channels(ratio: float, allowed: List[int]) -> int:
    """idx = min(floor(ratio * len), len - 1) (reference: slimmable.cpp:100-106).
    The contract is ratio in [0, 1] (NAM/slimmable.h:19). Ratios > 1 clamp to
    the largest width — exactly what the reference's min() does, and what a
    host knob rounding to 1.0+epsilon expects. Negative ratios are UB in the
    reference (out-of-bounds index); Python would silently WRAP to the largest
    width — fail loudly instead."""
    if ratio < 0.0:
        raise ValueError(f"slimmable size must be >= 0, got {ratio}")
    idx = min(int(math.floor(ratio * len(allowed))), len(allowed) - 1)
    return allowed[idx]


# =============================================================================
# Flat-stream weight extraction (reference: slimmable.cpp:21-261)
# =============================================================================


class _Walk:
    """Walks the full flat weight stream, emitting the slimmed subset."""

    def __init__(self, full: np.ndarray):
        self.src = np.asarray(full, dtype=np.float32).reshape(-1)
        self.pos = 0
        self.out: List[np.ndarray] = []

    def conv1x1(self, full_in, full_out, slim_in, slim_out, bias):
        """First slim_out rows x first slim_in cols of a row-major (out, in)
        matrix, then first slim_out of the bias (reference: slimmable.cpp:23-44)."""
        n = full_out * full_in
        w = self.src[self.pos : self.pos + n].reshape(full_out, full_in)
        self.pos += n
        self.out.append(w[:slim_out, :slim_in].reshape(-1))
        if bias:
            b = self.src[self.pos : self.pos + full_out]
            self.pos += full_out
            self.out.append(b[:slim_out])

    def conv1d(self, full_in, full_out, slim_in, slim_out, kernel_size):
        """(out, in, k) layout; bias always present (reference: slimmable.cpp:48-70)."""
        n = full_out * full_in * kernel_size
        w = self.src[self.pos : self.pos + n].reshape(full_out, full_in, kernel_size)
        self.pos += n
        self.out.append(w[:slim_out, :slim_in, :].reshape(-1))
        b = self.src[self.pos : self.pos + full_out]
        self.pos += full_out
        self.out.append(b[:slim_out])

    def copy(self, n):
        self.out.append(self.src[self.pos : self.pos + n])
        self.pos += n

    def result(self) -> np.ndarray:
        return np.concatenate(self.out) if self.out else np.zeros(0, np.float32)


def _compute_slim_bottleneck(ac, new_channels: int) -> int:
    """(reference: compute_slim_bottleneck, slimmable.cpp:80-85)"""
    if not ac.layer1x1_active:
        return new_channels
    return max(1, ac.bottleneck * new_channels // ac.channels)


def _validate_array(ac) -> None:
    """(reference: validate_groups slimmable.cpp:88-98 + head kernel check :139-145)"""
    if ac.head_kernel_size != 1:
        raise ValueError(
            "SlimmableWavenet: head rechannel kernel_size must be 1 (slimming with head "
            "kernel_size > 1 is not implemented)"
        )
    if ac.groups_input != 1:
        raise ValueError("SlimmableWavenet: groups_input > 1 not supported")
    if ac.groups_input_mixin != 1:
        raise ValueError("SlimmableWavenet: groups_input_mixin > 1 not supported")
    if ac.layer1x1_active and ac.layer1x1_groups != 1:
        raise ValueError("SlimmableWavenet: layer1x1 groups > 1 not supported")
    if ac.head1x1_active and ac.head1x1_groups != 1:
        raise ValueError("SlimmableWavenet: head1x1 groups > 1 not supported")


def extract_slimmed_weights(
    cfg: WaveNetConfig, full_weights: np.ndarray, new_channels: List[int]
) -> np.ndarray:
    """Walk the full weight stream in set_weights_ order, slicing first
    rows/cols (reference: extract_slimmed_weights, slimmable.cpp:128-261)."""
    walk = _Walk(full_weights)
    num_arrays = len(cfg.layer_arrays)
    for arr, ac in enumerate(cfg.layer_arrays):
        _validate_array(ac)
        full_ch, full_bn = ac.channels, ac.bottleneck
        slim_ch = new_channels[arr]
        slim_bn = _compute_slim_bottleneck(ac, slim_ch)
        slim_input = ac.input_size if arr == 0 else new_channels[arr - 1]
        slim_head_size = new_channels[arr + 1] if arr < num_arrays - 1 else ac.head_size
        full_head_out = ac.head1x1_out_channels if ac.head1x1_active else full_bn
        slim_head_out = ac.head1x1_out_channels if ac.head1x1_active else slim_bn
        cond = ac.condition_size

        walk.conv1x1(ac.input_size, full_ch, slim_input, slim_ch, bias=False)

        for l in range(ac.num_layers):
            K = ac.kernel_sizes[l]
            gated = ac.gating_modes[l] != NONE
            full_bg = 2 * full_bn if gated else full_bn
            slim_bg = 2 * slim_bn if gated else slim_bn

            # NOTE (parity-faithful quirk): for gated layers / shift-FiLMs the
            # out dim holds two stacked halves ([primary; gate] or [scale;
            # shift]), and taking the FIRST slim_bg rows of the 2*full_bn
            # matrix mixes rows from both halves. The reference does exactly
            # this (extract_conv1x1/extract_conv1d take rows [0:slim_out]
            # contiguously, slimmable.cpp:23-70 with slim_out=2*slim_bn at
            # :169-177) — reproduced, not fixed, so slimmed gated models match
            # the reference bit-for-bit.
            walk.conv1d(full_ch, full_bg, slim_ch, slim_bg, K)
            walk.conv1x1(cond, full_bg, cond, slim_bg, bias=False)
            if ac.layer1x1_active:
                walk.conv1x1(full_bn, full_ch, slim_bn, slim_ch, bias=True)
            if ac.head1x1_active:
                walk.conv1x1(full_bn, ac.head1x1_out_channels, slim_bn, ac.head1x1_out_channels, bias=True)

            films = dict(ac.films)

            def film_out(site, full_dim, slim_dim):
                fs = films[site]
                mult = 2 if fs.shift else 1
                walk.conv1x1(cond, mult * full_dim, cond, mult * slim_dim, bias=True)

            if films["conv_pre_film"].active:
                film_out("conv_pre_film", full_ch, slim_ch)
            if films["conv_post_film"].active:
                film_out("conv_post_film", full_bg, slim_bg)
            if films["input_mixin_pre_film"].active:
                mult = 2 if films["input_mixin_pre_film"].shift else 1
                dim = mult * cond
                walk.copy(cond * dim + dim)
            if films["input_mixin_post_film"].active:
                film_out("input_mixin_post_film", full_bg, slim_bg)
            if films["activation_pre_film"].active:
                film_out("activation_pre_film", full_bg, slim_bg)
            if films["activation_post_film"].active:
                film_out("activation_post_film", full_bn, slim_bn)
            if films["layer1x1_post_film"].active and ac.layer1x1_active:
                film_out("layer1x1_post_film", full_ch, slim_ch)
            if films["head1x1_post_film"].active and ac.head1x1_active:
                mult = 2 if films["head1x1_post_film"].shift else 1
                dim = mult * ac.head1x1_out_channels
                walk.copy(cond * dim + dim)

        # head_rechannel as conv1x1 since kernel==1 (reference: slimmable.cpp:253-254)
        walk.conv1x1(full_head_out, ac.head_size, slim_head_out, slim_head_size, bias=ac.head_bias)

    walk.copy(1)  # head_scale
    return walk.result()


def _slim_config(cfg: WaveNetConfig, new_channels: List[int]) -> WaveNetConfig:
    """(reference: modify_params_for_channels, slimmable.cpp:267-294)"""
    import dataclasses

    num_arrays = len(cfg.layer_arrays)
    new_arrays = []
    for i, ac in enumerate(cfg.layer_arrays):
        new_ch = new_channels[i]
        new_arrays.append(
            dataclasses.replace(
                ac,
                channels=new_ch,
                bottleneck=_compute_slim_bottleneck(ac, new_ch),
                input_size=ac.input_size if i == 0 else new_channels[i - 1],
                head_size=new_channels[i + 1] if i < num_arrays - 1 else ac.head_size,
            )
        )
    return dataclasses.replace(cfg, layer_arrays=tuple(new_arrays))


# =============================================================================
# SlimmableWavenetModel
# =============================================================================


class SlimmableWavenetModel(SlimmableModelMixin):
    """Width-switchable WaveNet (reference: SlimmableWavenet,
    NAM/wavenet/slimmable.h:42-105)."""

    architecture = "WaveNet"  # registered under "WaveNet" with slimmable config

    def __init__(self, data: NamData):
        from .wavenet import build as wavenet_build  # avoid import cycle

        config = data.config.get("model", data.config)
        self._config_json = config
        self._full_weights = np.asarray(data.weights, dtype=np.float32)
        self.metadata = ModelMetadata.from_nam_data(data)

        # Parse the full-size model through the standard path.
        full_cfg, full_params = wavenet_build(
            config, self._full_weights, data.expected_sample_rate
        )
        if full_cfg.head is not None:
            raise ValueError("SlimmableWavenet: post-stack head is not supported")
        self._full_cfg = full_cfg

        # Per-array allowed channels (reference: slimmable.cpp:548-575).
        per_array_allowed: List[List[int]] = []
        for lc in config["layers"]:
            allowed: List[int] = []
            s = lc.get("slimmable")
            if isinstance(s, dict):
                method = s.get("method", "")
                if method != SLIMMABLE_METHOD:
                    raise ValueError(f"SlimmableWavenet: unsupported slimmable method '{method}'")
                kw = s.get("kwargs", {})
                if "allowed_channels" in kw:
                    allowed = [int(c) for c in kw["allowed_channels"]]
                else:
                    allowed = list(range(1, int(lc["channels"]) + 1))
            per_array_allowed.append(allowed)
        if len(per_array_allowed) != len(full_cfg.layer_arrays):
            raise ValueError(
                "SlimmableWavenet: per_array_allowed_channels size must match number of layer arrays"
            )
        any_slimmable = False
        for i, allowed in enumerate(per_array_allowed):
            if allowed:
                any_slimmable = True
                if any(allowed[j] <= allowed[j - 1] for j in range(1, len(allowed))):
                    raise ValueError("SlimmableWavenet: allowed_channels must be sorted ascending")
                if allowed[-1] != full_cfg.layer_arrays[i].channels:
                    raise ValueError(
                        "SlimmableWavenet: last allowed_channels entry must equal the full "
                        "channel count for that array"
                    )
        if not any_slimmable:
            raise ValueError("SlimmableWavenet: at least one layer array must have allowed_channels")
        self._per_array_allowed = per_array_allowed

        arch = registry.get_architecture("WaveNet")
        full_model = Model(arch, full_cfg, full_params, self.metadata)
        full_key = tuple(ac.channels for ac in full_cfg.layer_arrays)
        # Width -> built Model cache ("pre-compile all widths and swap which
        # jitted fn the host calls").
        self._models: Dict[Tuple[int, ...], Model] = {full_key: full_model}
        self._current_key = full_key
        self._batch = 1
        self._sample_rate: Optional[float] = None
        self._max_buffer_size = DEFAULT_MAX_BUFFER_SIZE

    # -- construction of slimmed widths --------------------------------------

    def _channels_for_size(self, val: float) -> Tuple[int, ...]:
        """(reference: _get_channels_for_slimmable_size, slimmable.cpp:404-419)"""
        out = []
        for i, ac in enumerate(self._full_cfg.layer_arrays):
            allowed = self._per_array_allowed[i]
            out.append(ac.channels if not allowed else _ratio_to_channels(val, allowed))
        return tuple(out)

    def _model_for_channels(self, key: Tuple[int, ...]) -> Model:
        if key in self._models:
            return self._models[key]
        from .wavenet import _build_params  # standard param builder
        from ..formats import WeightReader
        import jax.numpy as jnp

        slim_weights = extract_slimmed_weights(self._full_cfg, self._full_weights, list(key))
        slim_cfg = _slim_config(self._full_cfg, list(key))
        reader = WeightReader(slim_weights)
        # Rebuild condition DSP params fresh each time (reference rebuilds the
        # condition DSP from JSON, slimmable.cpp:439-442); params are identical
        # so reuse the full model's.
        cond_params = self._models[tuple(ac.channels for ac in self._full_cfg.layer_arrays)].params.get(
            "condition"
        )
        params = _build_params(slim_cfg, reader, cond_params)
        params["head_scale"] = jnp.float32(reader.take_scalar())
        reader.assert_exhausted()
        arch = registry.get_architecture("WaveNet")
        model = Model(arch, slim_cfg, params, self.metadata)
        # A width built lazily after the user set prewarm_on_reset must
        # inherit the wrapper's current setting, not the thread-local default
        # (the setter above only reaches already-built widths).
        model.prewarm_on_reset = self.prewarm_on_reset
        self._models[key] = model
        return model

    # -- DSP-alike surface ----------------------------------------------------

    @property
    def active_model(self) -> Model:
        return self._models[self._current_key]

    @property
    def num_input_channels(self) -> int:
        return self.active_model.num_input_channels

    @property
    def num_output_channels(self) -> int:
        # Fixed by the last array's head_size (unchanged under slimming).
        return self.active_model.num_output_channels

    @property
    def expected_sample_rate(self) -> float:
        return self.metadata.sample_rate

    @property
    def prewarm_on_reset(self) -> bool:
        return self.active_model.prewarm_on_reset

    @prewarm_on_reset.setter
    def prewarm_on_reset(self, v: bool) -> None:
        for m in self._models.values():
            m.prewarm_on_reset = v

    def get_prewarm_samples(self) -> int:
        return self.active_model.get_prewarm_samples()

    def reset(self, batch: int = 1, sample_rate: Optional[float] = None,
              max_buffer_size: int = DEFAULT_MAX_BUFFER_SIZE):
        self._batch = batch
        if sample_rate is not None:
            self._sample_rate = sample_rate
        self._max_buffer_size = max_buffer_size
        return self.active_model.reset(batch, sample_rate, max_buffer_size)

    def process(self, x, state):
        return self.active_model.process(x, state)

    def render(self, x, **kw):
        return self.active_model.render(x, **kw)

    # -- slimmable interface ---------------------------------------------------

    def set_slimmable_size(self, val: float) -> Optional[Any]:
        key = self._channels_for_size(val)
        if key == self._current_key:
            return None
        state = self._build_state_for_key(key)
        self._current_key = key
        return state

    # -- non-blocking switching hooks (see SlimmableModelMixin) --------------

    def _resolve_size_key(self, val: float) -> Tuple[int, ...]:
        return self._channels_for_size(val)

    def _build_state_for_key(self, key: Tuple[int, ...]) -> Any:
        model = self._model_for_channels(key)
        return model.reset(self._batch, self._sample_rate, self._max_buffer_size)

    def _activate_size_key(self, key: Tuple[int, ...]) -> None:
        self._current_key = key

    def _current_size_key(self) -> Tuple[int, ...]:
        return self._current_key

    def get_slimmable_size_breakpoints(self) -> List[float]:
        """(reference: get_ratio_breakpoints, slimmable.cpp:108-121)"""
        bps = set()
        for allowed in self._per_array_allowed:
            for i in range(1, len(allowed)):
                bps.add(i / len(allowed))
        return sorted(bps)
