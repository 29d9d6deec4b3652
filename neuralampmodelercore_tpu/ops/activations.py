"""Activation functions and their configuration.

TPU-native re-implementation of the reference's activation subsystem
(reference: NAM/activations.{h,cpp}). Instead of virtual `apply(float*, n)`
scalar loops, every activation is a pure elementwise jnp function applied to
whole (batch, time, channels) blocks, so XLA fuses it into the surrounding
matmuls on the VPU.

Feature parity:
  - 11 activation types + Identity (reference: NAM/activations.h:27-40)
  - string-or-object JSON config parsing (reference: NAM/activations.cpp:59-130)
  - global fast-tanh mode: rebinding "Tanh" -> rational fast_tanh approximation
    (reference: NAM/activations.cpp:168-187). Note this is a *compile-time*
    mode here: changing it triggers retracing of jitted step functions.
  - LUT mode replacing Tanh/Sigmoid/SiLU with a linear-interpolation lookup
    table (reference: FastLUTActivation, NAM/activations.h:374-425,
    NAM/activations.cpp:189-232).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

JSON = Union[str, dict]


# =============================================================================
# Config
# =============================================================================

_SIMPLE_TYPES = (
    "Tanh",
    "Hardtanh",
    "Fasttanh",
    "ReLU",
    "Sigmoid",
    "SiLU",
    "Hardswish",
    "Softsign",
)

# Both casings accepted (reference: NAM/activations.cpp:74-75).
_NAME_ALIASES = {"LeakyHardTanh": "LeakyHardtanh"}

_ALL_TYPES = frozenset(_SIMPLE_TYPES) | {"LeakyReLU", "PReLU", "LeakyHardtanh"}


@dataclasses.dataclass(frozen=True)
class ActivationConfig:
    """Typed activation configuration (reference: NAM/activations.h:43-58).

    Frozen + hashable so it can live inside static jit-carried model configs.
    ``negative_slopes`` is a tuple (not list) for hashability.
    """

    type: str = "Identity"
    negative_slope: Optional[float] = None  # LeakyReLU / PReLU (single)
    negative_slopes: Optional[Tuple[float, ...]] = None  # PReLU (per-channel)
    min_val: Optional[float] = None  # LeakyHardtanh
    max_val: Optional[float] = None
    min_slope: Optional[float] = None
    max_slope: Optional[float] = None

    @staticmethod
    def simple(type_name: str) -> "ActivationConfig":
        return ActivationConfig(type=type_name)

    @staticmethod
    def from_json(j: JSON) -> "ActivationConfig":
        """Parse a string or {"type": ..., params} object
        (reference: NAM/activations.cpp:59-130)."""
        if isinstance(j, str):
            name = _NAME_ALIASES.get(j, j)
            if name not in _ALL_TYPES:
                raise ValueError(f"Unknown activation type: {j}")
            return ActivationConfig(type=name)
        if isinstance(j, dict):
            type_str = j["type"]
            name = _NAME_ALIASES.get(type_str, type_str)
            if name not in _ALL_TYPES:
                raise ValueError(f"Unknown activation type: {type_str}")
            cfg = {"type": name}
            if name == "PReLU":
                if "negative_slope" in j:
                    cfg["negative_slope"] = float(j["negative_slope"])
                elif "negative_slopes" in j:
                    cfg["negative_slopes"] = tuple(float(v) for v in j["negative_slopes"])
            elif name == "LeakyReLU":
                cfg["negative_slope"] = float(j.get("negative_slope", 0.01))
            elif name == "LeakyHardtanh":
                cfg["min_val"] = float(j.get("min_val", -1.0))
                cfg["max_val"] = float(j.get("max_val", 1.0))
                cfg["min_slope"] = float(j.get("min_slope", 0.01))
                cfg["max_slope"] = float(j.get("max_slope", 0.01))
            return ActivationConfig(**cfg)
        raise ValueError("Invalid activation config: expected string or object")


# =============================================================================
# Elementwise math (jnp; applied to full blocks)
# =============================================================================


def fast_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Rational tanh approximation (reference: NAM/activations.h:91-98)."""
    ax = jnp.abs(x)
    x2 = x * x
    num = x * (2.45550750702956 + 2.45550750702956 * ax + (0.893229853513558 + 0.821226666969744 * ax) * x2)
    den = 2.44506634652299 + (2.44506634652299 + x2) * jnp.abs(x + 0.814642734961073 * x * ax)
    return num / den


def fast_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """(reference: NAM/activations.h:100-103)"""
    return 0.5 * (fast_tanh(x * 0.5) + 1.0)


def hard_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, -1.0, 1.0)


def leaky_hardtanh(x, min_val, max_val, min_slope, max_slope):
    """(reference: NAM/activations.h:75-89)"""
    below = (x - min_val) * min_slope + min_val
    above = (x - max_val) * max_slope + max_val
    return jnp.where(x < min_val, below, jnp.where(x > max_val, above, x))


def hardswish(x: jnp.ndarray) -> jnp.ndarray:
    """x * clamp(x+3, 0, 6) / 6 (reference: NAM/activations.h:120-128)."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def softsign(x: jnp.ndarray) -> jnp.ndarray:
    return x / (1.0 + jnp.abs(x))


# =============================================================================
# Global modes: fast-tanh and LUT (reference: NAM/activations.cpp:168-232)
# =============================================================================

using_fast_tanh: bool = False

# name -> (min, max, n_points) ; replaces Tanh / Sigmoid / SiLU.
_luts: Dict[str, Tuple[float, float, int]] = {}

_LUT_BASE_FNS = {
    "Tanh": np.tanh,
    "Sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "SiLU": lambda x: x / (1.0 + np.exp(-x)),
}

_LUT_JNP_FNS = {
    "Tanh": jnp.tanh,
    "Sigmoid": lambda x: jax.nn.sigmoid(x),
    "SiLU": lambda x: x * jax.nn.sigmoid(x),
}


def enable_fast_tanh() -> None:
    """Rebind "Tanh" to the fast rational approximation
    (reference: NAM/activations.cpp:168-187). Triggers retrace of jitted steps."""
    global using_fast_tanh
    using_fast_tanh = True


def disable_fast_tanh() -> None:
    global using_fast_tanh
    using_fast_tanh = False


def enable_lut(function_name: str, min_x: float, max_x: float, n_points: int) -> None:
    """Replace an activation with a linear-interp lookup table
    (reference: NAM/activations.cpp:189-232)."""
    if function_name not in _LUT_BASE_FNS:
        raise ValueError(f"LUT not supported for activation: {function_name}")
    if n_points < 2:
        raise ValueError("LUT needs at least 2 points")
    _luts[function_name] = (float(min_x), float(max_x), int(n_points))


def disable_lut(function_name: str) -> None:
    _luts.pop(function_name, None)


def _lut_apply(x: jnp.ndarray, min_x: float, max_x: float, n: int, fn_name: str) -> jnp.ndarray:
    """Clamped uniform-grid linear-interpolation lookup
    (reference: FastLUTActivation::apply, NAM/activations.h:393-410).

    GATHER-FREE: the reference's tables are always built from a KNOWN base
    function on a uniform grid (enable_lut only accepts Tanh/Sigmoid/SiLU,
    NAM/activations.cpp:189-232), so the looked-up entries t[i] = f(g_i) are
    recomputed at the two bracketing grid points instead of fetched —
    reproducing the piecewise-linear output to ~1 ulp. A real table gather
    lowers to a serialized per-element loop on TPU: measured 339 ms/block vs
    2 ms exact-tanh at B=2048 (tools/bench_lut.py, v5e) — 170x slower. The
    re-evaluation form costs ~2 base-function evaluations (pure VPU), works
    inside the fused Pallas kernel (no table constant to capture), and keeps
    the LUT's exact interpolation semantics for render parity."""
    fn = _LUT_JNP_FNS[fn_name]
    step = (max_x - min_x) / (n - 1)
    xc = jnp.clip(x, min_x, max_x)
    f_idx = (xc - min_x) * (1.0 / step)
    i = jnp.clip(f_idx.astype(jnp.int32), 0, n - 2)
    frac = f_idx - i.astype(x.dtype)
    g0 = min_x + i.astype(x.dtype) * step
    y0 = fn(g0)
    y1 = fn(g0 + step)
    y = y0 + (y1 - y0) * frac
    # Edge case at max (reference: NAM/activations.h:403-405).
    return jnp.where(f_idx >= n - 1, fn(jnp.full_like(x, max_x)), y)


# =============================================================================
# Application
# =============================================================================


def apply(config: ActivationConfig, x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Apply an activation to x. Channel-dependent activations (PReLU) use
    ``channel_axis`` (default trailing, matching the reference's column-major
    channel-fastest layout, NAM/activations.h:282-298; the CTB engine layout
    passes channel_axis=0)."""
    t = config.type
    if t == "Identity":
        return x
    if t == "Tanh":
        if using_fast_tanh:
            return fast_tanh(x)
        if "Tanh" in _luts:
            return _lut_apply(x, *_luts["Tanh"], "Tanh")
        return jnp.tanh(x)
    if t == "Hardtanh":
        return hard_tanh(x)
    if t == "Fasttanh":
        return fast_tanh(x)
    if t == "ReLU":
        return jnp.maximum(x, 0.0)
    if t == "LeakyReLU":
        ns = config.negative_slope if config.negative_slope is not None else 0.01
        return jnp.where(x > 0, x, ns * x)
    if t == "PReLU":
        if config.negative_slopes is not None:
            slopes = tuple(float(s) for s in config.negative_slopes)
        elif config.negative_slope is not None:
            slopes = (float(config.negative_slope),)
        else:
            slopes = (0.01,)
        # Broadcast over the channel axis; reference indexes pos % n_slopes
        # with channels fastest (NAM/activations.h:293-297). Built from
        # scalar literals + iota (NOT a closed-over device array): this code
        # also runs inside the fused Pallas kernel, whose kernel function
        # may not capture array constants.
        ax = channel_axis % x.ndim
        c = x.shape[ax]
        n = len(slopes)
        if c % n != 0:
            raise ValueError(
                f"PReLU got {c} channels but activation has {n} slopes, which doesn't divide evenly."
            )
        if n == 1:
            return jnp.where(x > 0, x, slopes[0] * x)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax) % n
        neg = slopes[0] * x
        for k in range(1, n):
            neg = jnp.where(idx == k, slopes[k] * x, neg)
        return jnp.where(x > 0, x, neg)
    if t == "Sigmoid":
        if using_fast_tanh:
            # The reference's LSTM uses fast_sigmoid when fast-tanh mode is on
            # (NAM/lstm.cpp:48-58); the standalone Sigmoid activation object is
            # NOT rebound by enable_fast_tanh (NAM/activations.cpp:168-187), so
            # keep exact sigmoid here.
            pass
        if "Sigmoid" in _luts:
            return _lut_apply(x, *_luts["Sigmoid"], "Sigmoid")
        return jax.nn.sigmoid(x)
    if t == "SiLU":
        if "SiLU" in _luts:
            return _lut_apply(x, *_luts["SiLU"], "SiLU")
        return x * jax.nn.sigmoid(x)
    if t == "Hardswish":
        return hardswish(x)
    if t == "Softsign":
        return softsign(x)
    if t == "LeakyHardtanh":
        return leaky_hardtanh(
            x,
            config.min_val if config.min_val is not None else -1.0,
            config.max_val if config.max_val is not None else 1.0,
            config.min_slope if config.min_slope is not None else 0.01,
            config.max_slope if config.max_slope is not None else 0.01,
        )
    raise ValueError(f"Unknown activation type: {t}")
