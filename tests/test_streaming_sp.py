"""Streaming time-SP: per-block ppermute halo handoff across time shards.

Sharded-vs-unsharded equivalence on the virtual 8-device CPU mesh: a long
stream processed in blocks of n_devices*T samples, each block split across
the mesh's time axis, must match the single-device streaming step — the
ring lookback contract (reference: NAM/conv1d.cpp:126-137) carried across
both the device boundary (intra-block ppermute) and the block boundary
(wrap-around carry).
"""

import os

import numpy as np
import pytest

import jax

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.parallel.sharding import (
    TIME_AXIS,
    _max_conv_rf,
    make_mesh,
    time_sharded_stream_step,
)
from conftest import EXAMPLE_MODELS

needs_devices = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >=4 virtual devices"
)


def _run_sp_vs_unsharded(model, Tl, n_blocks, n_dev=4, atol=1e-5):
    model.prewarm_on_reset = False
    mesh = make_mesh(n_devices=n_dev, axis_names=(TIME_AXIS,))
    state_sp, sp_step = time_sharded_stream_step(model, mesh, block_per_device=Tl)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n_blocks * n_dev * Tl) * 0.3).astype(np.float32)

    st = model.init_state(1)
    got, want = [], []
    B = n_dev * Tl
    for i in range(n_blocks):
        blk = x[i * B : (i + 1) * B]
        y_sp, state_sp = sp_step(model.params, state_sp, blk)
        got.append(np.asarray(y_sp))
        y, st = model.process(blk[None], st)
        want.append(np.asarray(y)[0])
    np.testing.assert_allclose(
        np.concatenate(got), np.concatenate(want), atol=atol
    )


@needs_devices
def test_sp_stream_small_wavenet():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    # wavenet.nam max conv rf is small; Tl=32 forces real halo traffic
    _run_sp_vs_unsharded(m, Tl=32, n_blocks=6)


@needs_devices
def test_sp_stream_condition_dsp():
    """Nested WaveNet condition DSP: its convs halo-exchange too."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_condition_dsp.nam"))
    _run_sp_vs_unsharded(m, Tl=16, n_blocks=6)


@needs_devices
def test_sp_stream_flagship_depth():
    """Flagship-depth dilations (rf up to 1024): Tl must cover the largest
    conv rf; one block per device is 1024 samples."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    rf = _max_conv_rf(m.config)
    assert rf == 1024
    _run_sp_vs_unsharded(m, Tl=1024, n_blocks=3, atol=2e-5)


@needs_devices
def test_sp_stream_rejects_small_block():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    mesh = make_mesh(n_devices=4, axis_names=(TIME_AXIS,))
    with pytest.raises(ValueError, match="receptive field"):
        time_sharded_stream_step(m, mesh, block_per_device=64)


@needs_devices
def test_sp_stream_rejects_lstm():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    mesh = make_mesh(n_devices=4, axis_names=(TIME_AXIS,))
    with pytest.raises(ValueError, match="WaveNet"):
        time_sharded_stream_step(m, mesh, block_per_device=64)
