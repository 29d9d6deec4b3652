"""neuralampmodelercore_tpu: a TPU-native neural amp-modeling engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
NeuralAmpModelerCore (the reference implementation at
github.com/sdatkinson/NeuralAmpModelerCore): it loads standard `.nam` model
files (WaveNet, LSTM, ConvNet, Linear, SlimmableWavenet, SlimmableContainer)
and runs them as batched block-streaming inference on TPU, matching the
reference's outputs within the repo's SNR bound.

Public API:
    model = load_model("model.nam")          # == nam::get_dsp (NAM/get_dsp.h:84-114)
    state = model.reset(batch=1024)           # allocate + prewarm
    y, state = model.process(x, state)        # x: (batch, frames[, channels])
    y = model.render(x)                       # offline full-sequence render
"""

from __future__ import annotations

import os
from typing import Any, Optional, Union

from . import registry
from .formats import (
    ModelMetadata,
    NamData,
    UNKNOWN_EXPECTED_SAMPLE_RATE,
    parse_nam_file,
    parse_nam_json,
)
from .version import (
    EARLIEST_SUPPORTED_NAM_FILE_VERSION,
    LATEST_FULLY_SUPPORTED_NAM_FILE_VERSION,
    Supported,
    __version__,
    register_version_support_checker,
    verify_config_version,
)
from .models.base import DEFAULT_MAX_BUFFER_SIZE, Model, ScopedPrewarmOnResetDefault

# Importing the model modules registers the architectures.
from .models import wavenet, lstm, convnet, linear  # noqa: F401
from .models.container import ContainerModel, SlimmableModelMixin, load_container
from .models.slimmable import SlimmableWavenetModel, config_is_slimmable_wavenet
from .models.engine import StreamEngine
from .ops import activations
from .ops.layers import set_matmul_precision

__all__ = [
    "load_model",
    "get_dsp",
    "Model",
    "StreamEngine",
    "set_matmul_precision",
    "ContainerModel",
    "SlimmableWavenetModel",
    "SlimmableModelMixin",
    "ScopedPrewarmOnResetDefault",
    "ModelMetadata",
    "NamData",
    "activations",
    "registry",
    "__version__",
]


def _load_from_data(data: NamData) -> Any:
    """Unified construction path (reference: get_dsp_with_current_prewarm_default,
    NAM/get_dsp.cpp:241-264 + wavenet::create_config dispatch,
    NAM/wavenet/model.cpp:1234-1248)."""
    custom = registry.get_custom_loader(data.architecture)
    if custom is not None:
        return custom(data)
    if data.architecture == "SlimmableContainer":
        return load_container(data, _load_from_json)
    if data.architecture == "WaveNet" and config_is_slimmable_wavenet(data.config):
        return SlimmableWavenetModel(data)
    arch = registry.get_architecture(data.architecture)
    config, params = arch.build(data.config, data.weights, data.expected_sample_rate)
    return Model(arch, config, params, ModelMetadata.from_nam_data(data))


def _load_from_json(j: dict) -> Any:
    return _load_from_data(parse_nam_json(j))


def load_model(
    source: Union[str, os.PathLike, dict, NamData],
    prewarm: Optional[bool] = None,
    return_data: bool = False,
):
    """Load a .nam model from a path, JSON dict, or parsed NamData.

    ``prewarm`` mirrors DspLoadOptions.prewarm (reference: NAM/get_dsp.h:70-78,
    get_dsp.cpp:268-278): if set, it overrides the thread-local
    prewarm-on-reset default during load, and the returned model is restored
    to the previous default.

    ``return_data=True`` returns ``(model, NamData)`` — the reference's
    returnedConfig overloads (NAM/get_dsp.h:96-114).
    """
    if isinstance(source, NamData):
        data = source
    elif isinstance(source, dict):
        data = parse_nam_json(source)
    else:
        data = parse_nam_file(source)

    if prewarm is None:
        model = _load_from_data(data)
    else:
        with ScopedPrewarmOnResetDefault(prewarm) as scoped:
            model = _load_from_data(data)
            model.prewarm_on_reset = scoped.previous_prewarm_on_reset
    return (model, data) if return_data else model


# The reference's name for model loading (NAM/get_dsp.h:84-114).
get_dsp = load_model


def get_dsp_legacy(dirname: Union[str, os.PathLike]):
    """Legacy directory-format loader (reference: NAM/dsp.h:360-368).

    The reference *declares* ``get_dsp_legacy(dirname)`` but ships no
    definition — any caller fails at link time. This raises the equivalent
    loud error at call time instead; the directory format predates the
    single-file ``.nam`` format that ``load_model`` handles.
    """
    raise NotImplementedError(
        f"get_dsp_legacy({os.fspath(dirname)!r}): the legacy directory model format is "
        "not supported (the reference declares this loader in NAM/dsp.h:368 but ships "
        "no implementation). Convert the model to a single-file .nam and use load_model()."
    )
