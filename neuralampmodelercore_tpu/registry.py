"""Architecture registry.

The TPU-native analog of the reference's ConfigParserRegistry
(reference: NAM/model_config.h:54-123): a name -> architecture-definition map
that `get_dsp`/`load_model` dispatches on, auto-populated at import time by
each architecture module, and open for external registration (the reference's
extensibility contract, NAM/registry.h + tools/test/test_extensible.cpp).

Unlike the reference's OO design (ModelConfig::create -> DSP subclass), an
architecture here is a bundle of pure functions over (static config, params
pytree, state pytree) — the shape jit wants:

  build(config_json, weights, sample_rate) -> (config, params)
  init_state(config, params, batch)        -> state
  step(config, params, state, x)           -> (y, state')

Meta-architectures that need host-side control flow (SlimmableContainer's
submodel switching) instead register a ``load`` hook returning a Model
subclass directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

Config = Any
Params = Any
State = Any


@dataclasses.dataclass(frozen=True)
class ArchDef:
    """Functional definition of a nestable architecture."""

    name: str
    config_cls: type
    # (config_json, weights, sample_rate) -> (config, params)
    build: Callable[[dict, np.ndarray, float], Tuple[Config, Params]]
    # (config, params, batch) -> state
    init_state: Callable[[Config, Params, int], State]
    # (config, params, state, x[B,T,Cin]) -> (y[B,T,Cout], state')
    step: Callable[[Config, Params, State, Any], Tuple[Any, State]]
    # (config, sample_rate) -> prewarm sample count
    prewarm_samples: Callable[[Config, float], int]
    in_channels: Callable[[Config], int]
    out_channels: Callable[[Config], int]
    # Optional block-size-specialized "engine" path: ring-chunk states with
    # O(block) traffic in the lane-aligned (C, T, B) layout (see ops/ring.py).
    # engine_prepare(config, params, T, batch) -> (eparams, state)
    engine_prepare: Optional[Callable[[Config, Params, int, int], Tuple[Params, State]]] = None
    # engine_step(config, T, eparams, state, x_ctb) -> (y_ctb, state')
    engine_step: Optional[Callable[..., Tuple[Any, State]]] = None
    # Recurrent architectures (LSTM) carry state that is NOT a pure function
    # of the last receptive-field inputs, so prewarming with ceil(n/T) zero
    # blocks runs extra recurrence steps past the reference's exact count
    # (NAM/lstm.cpp:127-134: 0.5 s = 24,000 samples). When True — and the
    # engine's eparams/state layouts are block-size independent, which a
    # recurrent arch's are (h/c carries, no rings) — StreamEngine.prewarm
    # runs the `n mod T` remainder through a separately-jitted step at the
    # remainder block size, making the engine prewarm EXACT-count.
    recurrent: bool = False


def engine_fns(arch: ArchDef):
    """(prepare(config, params, T, batch) -> (eparams, state),
    step(config, T, eparams, state, x_ctb) -> (y_ctb, state')) in the CTB
    engine layout. Architectures without a specialized engine get an adapter
    around the generic step (transposing at the boundary — fine for the
    small-state architectures that lack one)."""
    if arch.engine_prepare is not None and arch.engine_step is not None:
        return arch.engine_prepare, arch.engine_step

    def prepare(config, params, T, batch):
        return params, arch.init_state(config, params, batch)

    def step(config, T, eparams, state, x_ctb):
        x_btc = x_ctb.transpose(2, 1, 0)
        y_btc, state = arch.step(config, eparams, state, x_btc)
        return y_btc.transpose(2, 1, 0), state

    return prepare, step


_ARCHS: Dict[str, ArchDef] = {}
_BY_CONFIG_CLS: Dict[type, ArchDef] = {}

# Custom loaders for meta-architectures / external extensions:
# name -> (NamData -> Model). Checked before _ARCHS in load dispatch.
_CUSTOM_LOADERS: Dict[str, Callable[[Any], Any]] = {}


def register_architecture(arch: ArchDef) -> None:
    """(reference analog: ConfigParserHelper static-init auto-registration,
    NAM/model_config.h:98-104)"""
    prev = _BY_CONFIG_CLS.get(arch.config_cls)
    if prev is not None and prev.name != arch.name:
        # arch_for_config dispatches nested condition-DSP steps by config
        # TYPE inside traced code; silently rebinding a config class would
        # misroute built-in configs to the new arch with no error.
        raise ValueError(
            f"config class {arch.config_cls.__name__} is already bound to "
            f'architecture "{prev.name}"; register a distinct config class'
        )
    _ARCHS[arch.name] = arch
    _BY_CONFIG_CLS[arch.config_cls] = arch


def register_custom_loader(name: str, loader: Callable[[Any], Any]) -> None:
    """Register an external architecture by a load hook (reference analog:
    factory::Helper legacy shim, NAM/registry.h:20-67)."""
    _CUSTOM_LOADERS[name] = loader


def get_architecture(name: str) -> ArchDef:
    """Look up a BUILT-IN architecture. Custom-loader names (see
    register_custom_loader) have no ArchDef — they load through
    get_custom_loader; the error says so to keep the check-then-get pattern
    on has_architecture from dead-ending silently."""
    if name not in _ARCHS:
        if name in _CUSTOM_LOADERS:
            raise ValueError(
                f'"{name}" is registered as a custom loader, not a built-in '
                "architecture; load it via get_custom_loader/load_model"
            )
        raise ValueError(f'Unrecognized architecture "{name}"')
    return _ARCHS[name]


def has_architecture(name: str) -> bool:
    """True when the name is loadable — built-in OR custom loader."""
    return name in _ARCHS or name in _CUSTOM_LOADERS


def get_custom_loader(name: str) -> Optional[Callable[[Any], Any]]:
    return _CUSTOM_LOADERS.get(name)


def arch_for_config(config: Config) -> ArchDef:
    """Dispatch on a (static) config object's type — used for nested models
    (condition DSP) inside traced step functions."""
    arch = _BY_CONFIG_CLS.get(type(config))
    if arch is None:
        raise ValueError(f"No architecture registered for config type {type(config).__name__}")
    return arch
