"""Linear engine tier: zero-latency uniform-partitioned FFT convolution.

Pins the block-specialized engine path (models/linear.py engine_step — the
spectra-ring frequency-domain delay line matching the reference's
partitioned scheme, NAM/linear.cpp:115-278) against the generic
whole-window tier (itself pinned to the reference renders) at the
reference's implementation-equivalence tolerance class (5e-5,
tools/test/test_a2_fast.cpp:276-278).
"""

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.models.linear import _engine_partition
from neuralampmodelercore_tpu.tools.generate import make_nam


def _linear(rf, impl, seed=0, in_ch=1, out_ch=1):
    cfg = {
        "receptive_field": rf,
        "bias": True,
        "implementation": impl,
        "in_channels": in_ch,
        "out_channels": out_ch,
    }
    # Scale the IR so outputs stay O(1) regardless of rf (abs tolerances
    # then mean the same thing for a 128-tap and a 70k-tap IR).
    doc = make_nam("Linear", cfg, seed=seed, scale=0.3 / np.sqrt(rf))
    return nam.load_model(doc)


def _run_equivalence(model, T, n_blocks, atol=5e-5, seed=1, B=4):
    eng = StreamEngine(model, batch=B, block_size=T)
    st_e = eng.reset(prewarm=False)
    st_g = model.init_state(B)
    rng = np.random.default_rng(seed)
    C = model.num_input_channels
    for i in range(n_blocks):
        blk = (rng.standard_normal((B, T, C)) * 0.5).astype(np.float32)
        y_e, st_e = eng.process(blk, st_e)
        y_g, st_g = model.process(blk, st_g)
        np.testing.assert_allclose(
            np.asarray(y_e), np.asarray(y_g), atol=atol, err_msg=f"block {i} (T={T})"
        )


def test_partitioned_q256_partial_last_partition():
    """rf=1000 -> Q=256, 3 partitions with a partial last segment; 20 blocks
    at T=64 complete 5 partitions."""
    m = _linear(1000, "fft")
    assert _engine_partition(m.config, 64) == 256
    _run_equivalence(m, T=64, n_blocks=20)


def test_partitioned_q1024_long_ir():
    """rf=9000 -> Q=1024 (the >8192 row of the reference's table,
    linear.cpp:24-31); several partition completions."""
    m = _linear(9000, "fft")
    assert _engine_partition(m.config, 64) == 1024
    _run_equivalence(m, T=64, n_blocks=40)


def test_partitioned_odd_block_size():
    """T=48 does not divide the table's 256: the partition collapses to the
    block size (one completion per block)."""
    m = _linear(1000, "fft")
    assert _engine_partition(m.config, 48) == 48
    _run_equivalence(m, T=48, n_blocks=12)


def test_partitioned_block_size_invariance():
    """The same stream chopped at T=32 and T=128 produces the same samples
    (the reference's multi-call continuity property)."""
    m = _linear(3000, "fft", seed=2)
    B, n = 2, 768
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((B, n)) * 0.5).astype(np.float32)
    outs = {}
    for T in (32, 128):
        eng = StreamEngine(m, batch=B, block_size=T)
        st = eng.reset(prewarm=False)
        ys = []
        for i in range(0, n, T):
            y, st = eng.process(x[:, i : i + T], st)
            ys.append(np.asarray(y))
        outs[T] = np.concatenate(ys, axis=1)
    np.testing.assert_allclose(outs[32], outs[128], atol=5e-5)


def test_short_ir_fft_whole_window():
    """rf <= Q: no partitions — the engine runs the whole-window FFT path."""
    m = _linear(200, "fft")
    eng = StreamEngine(m, batch=2, block_size=64)
    assert "spec_re" not in eng.reset(prewarm=False)
    _run_equivalence(m, T=64, n_blocks=6)


def test_direct_engine():
    m = _linear(128, "auto")
    assert m.config.active_implementation == "direct"
    _run_equivalence(m, T=64, n_blocks=6, atol=1e-6)


def test_partitioned_multichannel_pad():
    """in=2/out=3: two processed channels + one zero output channel through
    the partitioned path (reference: linear.cpp:232-236)."""
    m = _linear(1000, "fft", in_ch=2, out_ch=3)
    B, T = 2, 64
    eng = StreamEngine(m, batch=B, block_size=T)
    st_e = eng.reset(prewarm=False)
    st_g = m.init_state(B)
    rng = np.random.default_rng(3)
    for _ in range(10):
        blk = (rng.standard_normal((B, T, 2)) * 0.5).astype(np.float32)
        y_e, st_e = eng.process(blk, st_e)
        y_g, st_g = m.process(blk, st_g)
        np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_g), atol=5e-5)
        assert np.all(np.asarray(y_e)[..., 2] == 0.0)


def test_partitioned_numpy_oracle():
    """Absolute ground truth: float64 numpy direct convolution."""
    m = _linear(2100, "fft", seed=4)  # Q=512 row
    B, T, nb = 1, 64, 24
    eng = StreamEngine(m, batch=B, block_size=T)
    st = eng.reset(prewarm=False)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(T * nb) * 0.5).astype(np.float32)
    ys = []
    for i in range(nb):
        y, st = eng.process(x[None, i * T : (i + 1) * T], st)
        ys.append(np.asarray(y)[0])
    got = np.concatenate(ys)
    ir = np.asarray(m.params["ir"], dtype=np.float64)
    bias = float(np.asarray(m.params["bias"]))
    want = np.convolve(x.astype(np.float64), ir)[: len(x)] + bias
    np.testing.assert_allclose(got, want, atol=5e-5)
