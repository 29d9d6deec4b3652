"""ConvNet: blocks of (dilated Conv1D k=2 -> folded BatchNorm -> activation)
plus a linear head.

TPU-native re-implementation of the reference ConvNet
(reference: NAM/convnet.{h,cpp}).

Weight-stream contract (reference: NAM/convnet.cpp:50-61, 14-37, 133-153):
  per block: Conv1D weights (kernel 2, bias iff NOT batchnorm), then
  BatchNorm running_mean(d), running_var(d), weight(d), bias(d), eps (1);
  then head: W (out x channels) row-major + bias (out).
BatchNorm is folded at load into scale/loc: scale = w/sqrt(eps+var),
loc = b - scale*mean (reference: convnet.cpp:30-37).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .. import registry
from ..formats import WeightReader
from ..ops import activations as act
from ..ops import layers as _L
from ..ops.layers import (
    Conv1dSpec,
    conv1d_init_state,
    conv1d_params,
    conv1d_step,
)


@dataclasses.dataclass(frozen=True)
class ConvNetConfig:
    """(reference: parse_config_json, NAM/convnet.cpp:326-339)"""

    channels: int
    dilations: Tuple[int, ...]
    batchnorm: bool
    activation: act.ActivationConfig
    groups: int = 1
    in_channels: int = 1
    out_channels: int = 1


def _block_spec(cfg: ConvNetConfig, i: int) -> Conv1dSpec:
    # kernel 2 ("HACK 2 kernel"), bias iff no batchnorm (reference: convnet.cpp:57).
    return Conv1dSpec(
        in_channels=cfg.in_channels if i == 0 else cfg.channels,
        out_channels=cfg.channels,
        kernel_size=2,
        dilation=cfg.dilations[i],
        bias=not cfg.batchnorm,
        groups=cfg.groups,
    )


def build(config: dict, weights: np.ndarray, sample_rate: float):
    cfg = ConvNetConfig(
        channels=int(config["channels"]),
        dilations=tuple(int(d) for d in config["dilations"]),
        batchnorm=bool(config["batchnorm"]),
        activation=act.ActivationConfig.from_json(config["activation"]),
        groups=int(config.get("groups", 1)),
        in_channels=int(config.get("in_channels", 1)),
        out_channels=int(config.get("out_channels", 1)),
    )
    reader = WeightReader(weights)
    blocks = []
    for i in range(len(cfg.dilations)):
        bp: Dict[str, Any] = {"conv": conv1d_params(_block_spec(cfg, i), reader)}
        if cfg.batchnorm:
            d = cfg.channels
            mean = reader.take(d).astype(np.float64)
            var = reader.take(d).astype(np.float64)
            w = reader.take(d).astype(np.float64)
            b = reader.take(d).astype(np.float64)
            eps = reader.take_scalar()
            scale = w / np.sqrt(eps + var)
            loc = b - scale * mean
            bp["bn_scale"] = jnp.asarray(scale.astype(np.float32))
            bp["bn_loc"] = jnp.asarray(loc.astype(np.float32))
        blocks.append(bp)
    head_w = reader.take(cfg.out_channels * cfg.channels).reshape(cfg.out_channels, cfg.channels)
    head_b = reader.take(cfg.out_channels)
    params = {
        "blocks": blocks,
        "head_w": jnp.asarray(head_w.T.copy()),
        "head_b": jnp.asarray(head_b),
    }
    reader.assert_exhausted()
    return cfg, params


def init_state(cfg: ConvNetConfig, params, batch: int):
    return {"blocks": [conv1d_init_state(_block_spec(cfg, i), batch) for i in range(len(cfg.dilations))]}


def step(cfg: ConvNetConfig, params, state, x):
    """x: (B, T, in_channels) -> (y, state')
    (reference: ConvNet::process, NAM/convnet.cpp:206-278)."""
    new_blocks = []
    h = x
    for i in range(len(cfg.dilations)):
        bp = params["blocks"][i]
        h, bs = conv1d_step(_block_spec(cfg, i), bp["conv"], state["blocks"][i], h)
        new_blocks.append(bs)
        if cfg.batchnorm:
            h = h * bp["bn_scale"] + bp["bn_loc"]
        h = act.apply(cfg.activation, h)
    y = jnp.matmul(h, params["head_w"], precision=_L.MATMUL_PRECISION) + params["head_b"]
    return y, {"blocks": new_blocks}


def prewarm_samples(cfg: ConvNetConfig, sample_rate: float) -> int:
    """1 + sum of dilations (reference: convnet.cpp:200-203)."""
    return 1 + sum(cfg.dilations)


# -- engine path (fixed T, ring-chunk conv states, (C, T, B) layout) ---------

from ..ops.ring import conv1d_w_ctb, dot_ctb, ring_conv_init, ring_conv_step  # noqa: E402


def engine_prepare(cfg: ConvNetConfig, params, T: int, batch: int):
    import numpy as _np

    eparams = {
        "blocks": [
            {
                "conv": conv1d_w_ctb(_block_spec(cfg, i), bp["conv"]),
                **(
                    {"bn_scale": bp["bn_scale"], "bn_loc": bp["bn_loc"]}
                    if cfg.batchnorm
                    else {}
                ),
            }
            for i, bp in enumerate(params["blocks"])
        ],
        "head_w": jnp.asarray(_np.asarray(params["head_w"]).T.copy()),  # (O, C)
        "head_b": params["head_b"],
    }
    state = {
        "blocks": [ring_conv_init(_block_spec(cfg, i), T, batch) for i in range(len(cfg.dilations))]
    }
    return eparams, state


def engine_step(cfg: ConvNetConfig, T: int, eparams, state, x):
    new_blocks = []
    h = x  # (C, T, B)
    for i in range(len(cfg.dilations)):
        bp = eparams["blocks"][i]
        h, bs = ring_conv_step(_block_spec(cfg, i), T, bp["conv"], state["blocks"][i], h)
        new_blocks.append(bs)
        if cfg.batchnorm:
            h = h * bp["bn_scale"][:, None, None] + bp["bn_loc"][:, None, None]
        h = act.apply(cfg.activation, h, channel_axis=0)
    y = dot_ctb(eparams["head_w"], h) + eparams["head_b"][:, None, None]
    return y, {"blocks": new_blocks}


registry.register_architecture(
    registry.ArchDef(
        name="ConvNet",
        config_cls=ConvNetConfig,
        build=build,
        init_state=init_state,
        step=step,
        prewarm_samples=prewarm_samples,
        in_channels=lambda c: c.in_channels,
        out_channels=lambda c: c.out_channels,
        engine_prepare=engine_prepare,
        engine_step=engine_step,
    )
)
