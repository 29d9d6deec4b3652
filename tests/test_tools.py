"""Tests for tooling: model generator bookkeeping, state checkpointing,
native dataplane, StreamFarm, and the CLI entry points."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.tools import generate
from conftest import EXAMPLE_MODELS


# -- generator weight-count bookkeeping (second oracle vs the loader) --------


@pytest.mark.parametrize("name", [
    "wavenet.nam", "my_model.nam", "wavenet_a2_max.nam", "lstm.nam", "slimmable_wavenet.nam",
])
def test_generator_counts_match_example_models(name):
    j = json.load(open(os.path.join(EXAMPLE_MODELS, name)))
    arch = j["architecture"]
    counters = {"WaveNet": generate.wavenet_weight_count, "LSTM": generate.lstm_weight_count}
    assert counters[arch](j["config"]) == len(j["weights"])


@pytest.mark.parametrize("arch,config", [
    ("WaveNet", generate.wavenet_preset("simple")),
    ("WaveNet", generate.wavenet_preset("standard")),
    ("LSTM", {"input_size": 1, "hidden_size": 8, "num_layers": 2}),
    ("ConvNet", {"channels": 4, "dilations": [1, 2, 4], "batchnorm": True, "activation": "Tanh"}),
    ("ConvNet", {"channels": 4, "dilations": [1, 2], "batchnorm": False, "activation": "ReLU"}),
    ("Linear", {"receptive_field": 32, "bias": True}),
])
def test_generated_models_load_and_run(arch, config):
    """Generated .nam dicts load through the real loader (weight counts agree
    with the loader's strict consumption) and process finite audio."""
    doc = generate.make_nam(arch, config, seed=1, scale=0.1)
    m = nam.load_model(doc)
    m.prewarm_on_reset = False
    st = m.init_state(1)
    y, _ = m.process(np.zeros((1, 32), np.float32), st)
    assert np.isfinite(np.asarray(y)).all()


def test_generated_a2max_style_model():
    """Exercise the full feature set (gating modes, all FiLMs, head1x1,
    bottleneck, groups) through generator + loader."""
    lc = dict(
        input_size=1, condition_size=1, head_size=4, channels=4, bottleneck=2,
        kernel_sizes=[2, 3], dilations=[1, 3],
        activation=[{"type": "PReLU", "negative_slopes": [0.1, 0.2]}, "Softsign"],
        gating_mode=["gated", "blended"], secondary_activation="Sigmoid",
        head_bias=False,
        head1x1={"active": True, "out_channels": 6, "groups": 1},
        layer1x1={"active": True, "groups": 1},
        conv_pre_film={"active": True, "shift": True, "groups": 1},
        conv_post_film={"active": True, "shift": False, "groups": 1},
        input_mixin_pre_film={"active": True, "shift": True, "groups": 1},
        input_mixin_post_film={"active": True, "shift": True, "groups": 1},
        activation_pre_film={"active": True, "shift": True, "groups": 1},
        activation_post_film={"active": True, "shift": False, "groups": 1},
        layer1x1_post_film={"active": True, "shift": True, "groups": 1},
        head1x1_post_film={"active": True, "shift": True, "groups": 1},
    )
    config = {"layers": [lc], "head": None, "head_scale": 0.02}
    doc = generate.make_nam("WaveNet", config, seed=3, scale=0.1, version="0.6.0")
    m = nam.load_model(doc)
    m.prewarm_on_reset = False
    st = m.init_state(2)
    y, _ = m.process(np.zeros((2, 16), np.float32), st)
    assert np.asarray(y).shape == (2, 16, 4)


# -- checkpointing -----------------------------------------------------------


def test_state_checkpoint_roundtrip(tmp_path):
    from neuralampmodelercore_tpu.utils.checkpoint import save_state, load_state

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    st = m.init_state(2)
    x = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32) * 0.2
    y1, st = m.process(x, st)

    path = str(tmp_path / "state.npz")
    save_state(path, st, metadata={"batch": 2})

    st2 = load_state(path, m.init_state(2))
    # Resuming from the snapshot continues the stream exactly.
    y2a, _ = m.process(x, st)
    y2b, _ = m.process(x, st2)
    np.testing.assert_array_equal(np.asarray(y2a), np.asarray(y2b))


def test_state_checkpoint_shape_mismatch(tmp_path):
    from neuralampmodelercore_tpu.utils.checkpoint import save_state, load_state

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    st = m.init_state(2)
    path = str(tmp_path / "state.npz")
    save_state(path, st)
    with pytest.raises(ValueError, match="shape"):
        load_state(path, m.init_state(3))


# -- native dataplane --------------------------------------------------------


def test_native_transposes_match_numpy():
    from neuralampmodelercore_tpu.utils.native import transpose_bt_tb, transpose_tb_bt

    x = np.random.default_rng(1).standard_normal((37, 129)).astype(np.float32)
    np.testing.assert_array_equal(transpose_bt_tb(x), x.T)
    np.testing.assert_array_equal(transpose_tb_bt(x.T), x)


def test_native_pcm_decode_matches_python():
    from neuralampmodelercore_tpu.utils.native import decode_pcm

    rng = np.random.default_rng(2)
    i16 = rng.integers(-32768, 32767, 100, dtype=np.int16)
    np.testing.assert_allclose(decode_pcm(i16.tobytes(), 16), i16 / 32768.0, rtol=1e-6)
    # 24-bit
    vals = rng.integers(-(1 << 23), (1 << 23) - 1, 50, dtype=np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    np.testing.assert_allclose(decode_pcm(raw, 24), vals / float(1 << 23), rtol=1e-6)


def test_block_ring_fifo_and_backpressure():
    from neuralampmodelercore_tpu.utils.native import BlockRing

    r = BlockRing(capacity=4, block_len=16)
    for i in range(4):
        assert r.push(np.full(16, float(i), np.float32))
    assert not r.push(np.zeros(16, np.float32))  # full
    for i in range(4):
        out = r.pop()
        assert out is not None and out[0] == float(i)
    assert r.pop() is None


# -- StreamFarm --------------------------------------------------------------


def _farm_reference(m, x, B, T, n_blocks):
    st = m.init_state(B)
    ref = []
    for blk in range(n_blocks):
        y, st = m.process(x[:, blk * T : (blk + 1) * T], st)
        ref.append(np.asarray(y))
    return np.concatenate(ref, axis=1)


def test_ring_pool_assembly_demux():
    """RingPool: fused (T, B) assembly/demux against per-stream push/pop."""
    from neuralampmodelercore_tpu.utils.native import RingPool

    B, T = 5, 16
    p = RingPool(B, 4, T)
    rng = np.random.default_rng(0)
    blocks = rng.standard_normal((B, T)).astype(np.float32)
    assert p.push_range(0, blocks[:3]) == 3  # bulk feeder path
    assert p.push(3, blocks[3]) and p.push(4, blocks[4])
    out = np.zeros((T, B), np.float32)
    assert p.pop_all_tb(out) == B
    np.testing.assert_array_equal(out, blocks.T)
    # empty streams read as zeros and don't count as fed
    assert p.push(1, blocks[1])
    assert p.pop_all_tb(out) == 1
    assert (out[:, 0] == 0).all() and np.array_equal(out[:, 1], blocks[1])
    # scatter + per-stream pop roundtrip
    tb = rng.standard_normal((T, B)).astype(np.float32)
    assert p.push_all_tb(tb) == B
    np.testing.assert_array_equal(p.pop(2), tb[:, 2])


def test_stream_farm_end_to_end():
    """Pipelined (double-buffered) dispatch: block N-1's output lands during
    block N's device step; flush() drains the last in-flight block."""
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    B, T = 4, 64
    farm = StreamFarm(m, batch=B, block_size=T)
    farm.start()

    rng = np.random.default_rng(5)
    x = (rng.standard_normal((B, 3 * T)) * 0.3).astype(np.float32)

    outs = [[] for _ in range(B)]
    for blk in range(3):
        for b in range(B):
            assert farm.push(b, x[b, blk * T : (blk + 1) * T])
        fed = farm.dispatch()
        assert fed == B
    farm.flush()
    for b in range(B):
        while True:
            o = farm.pull(b)
            if o is None:
                break
            outs[b].append(o)
    got = np.stack([np.concatenate(o) for o in outs])
    assert got.shape == (B, 3 * T)

    # Must equal direct engine processing of the same streams.
    ref = _farm_reference(m, x, B, T, 3)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_stream_farm_sync_mode():
    """pipeline=False: each dispatch() demuxes its own block immediately."""
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    B, T = 4, 32
    farm = StreamFarm(m, batch=B, block_size=T, pipeline=False)
    farm.start()
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((B, 2 * T)) * 0.3).astype(np.float32)
    outs = [[] for _ in range(B)]
    for blk in range(2):
        farm.push_range(0, x[:, blk * T : (blk + 1) * T])
        farm.dispatch()
        for b in range(B):
            o = farm.pull(b)
            assert o is not None
            outs[b].append(o)
    got = np.stack([np.concatenate(o) for o in outs])
    ref = _farm_reference(m, x, B, T, 2)
    np.testing.assert_allclose(got, ref, atol=2e-5)


# -- CLI entry points --------------------------------------------------------


def test_render_cli(tmp_path):
    from neuralampmodelercore_tpu.cli.render import main as render_main
    from neuralampmodelercore_tpu.utils.audio import read_wav, write_wav_float32

    wav_in = str(tmp_path / "in.wav")
    wav_out = str(tmp_path / "out.wav")
    x = (np.random.default_rng(0).standard_normal(2048) * 0.2).astype(np.float32)
    write_wav_float32(wav_in, x, 48000)
    rc = render_main([os.path.join(EXAMPLE_MODELS, "wavenet.nam"), wav_in, wav_out, "--full"])
    assert rc == 0
    y, sr = read_wav(wav_out)
    assert sr == 48000 and y.shape == (2048,) and np.isfinite(y).all()


def test_render_cli_sample_rate_gate(tmp_path):
    from neuralampmodelercore_tpu.cli.render import main as render_main
    from neuralampmodelercore_tpu.utils.audio import write_wav_float32

    wav_in = str(tmp_path / "in44.wav")
    write_wav_float32(wav_in, np.zeros(100, np.float32), 44100)
    rc = render_main([os.path.join(EXAMPLE_MODELS, "wavenet.nam"), wav_in, str(tmp_path / "o.wav")])
    assert rc == 1  # 44.1k vs 48k model (reference: render.cpp:139-144)


def test_loadmodel_cli(capsys):
    from neuralampmodelercore_tpu.cli.loadmodel import main as loadmodel_main

    rc = loadmodel_main([os.path.join(EXAMPLE_MODELS, "lstm.nam")])
    assert rc == 0
    assert "LSTM" in capsys.readouterr().out


def test_engine_state_checkpoint_roundtrip(tmp_path):
    from neuralampmodelercore_tpu.models.engine import StreamEngine
    from neuralampmodelercore_tpu.utils.checkpoint import save_state, load_state

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    eng = StreamEngine(m, batch=2, block_size=64)
    st = eng.init_state()
    x = np.random.default_rng(7).standard_normal((2, 64)).astype(np.float32) * 0.2
    _, st = eng.process(x, st)
    path = str(tmp_path / "estate.npz")
    save_state(path, st)
    st2 = load_state(path, eng.init_state())
    ya, _ = eng.process(x, st)
    yb, _ = eng.process(x, st2)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_engine_from_meta_models():
    from neuralampmodelercore_tpu.models.engine import StreamEngine

    c = nam.load_model(os.path.join(EXAMPLE_MODELS, "slimmable_container.nam"))
    c.prewarm_on_reset = False
    eng = StreamEngine(c, batch=1, block_size=64)
    st = eng.reset(prewarm=False)
    y, _ = eng.process(np.zeros((1, 64), np.float32), st)
    assert np.isfinite(np.asarray(y)).all()

    s = nam.load_model(os.path.join(EXAMPLE_MODELS, "slimmable_wavenet.nam"))
    s.prewarm_on_reset = False
    eng2 = StreamEngine(s, batch=1, block_size=64)
    st2 = eng2.reset(prewarm=False)
    y2, _ = eng2.process(np.zeros((1, 64), np.float32), st2)
    assert np.isfinite(np.asarray(y2)).all()


def test_generator_condition_dsp_emission():
    """Generator emits nested condition-DSP models (the reference's
    create_wavenet.py --output-channels / condition-dim axis); weight-count
    bookkeeping excludes the nested weights (they live in their own spec)."""
    from neuralampmodelercore_tpu.tools.generate import (
        make_nam,
        wavenet_preset,
        with_condition_dsp,
    )

    for sub_doc in (
        make_nam("WaveNet", wavenet_preset("simple"), seed=3),
        make_nam("LSTM", {"input_size": 1, "hidden_size": 4, "num_layers": 1,
                          "out_channels": 2}, seed=5),
    ):
        cfg = with_condition_dsp(wavenet_preset("simple"), sub_doc)
        m = nam.load_model(make_nam("WaveNet", cfg, seed=4))
        assert m.config.condition_config is not None
        st = m.init_state(1)
        x = (np.random.default_rng(0).standard_normal((1, 96)) * 0.3).astype(np.float32)
        y, _ = m.process(x, st)
        assert np.isfinite(np.asarray(y)).all()


def test_loudness_level_setters():
    """(reference: DSP::SetLoudness/SetInputLevel/SetOutputLevel,
    NAM/dsp.h:181-195)"""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.set_loudness(-18.5)
    m.set_input_level(12.0)
    m.set_output_level(6.0)
    assert m.has_loudness() and m.get_loudness() == -18.5
    assert m.has_input_level() and m.get_input_level() == 12.0
    assert m.has_output_level() and m.get_output_level() == 6.0


def test_render_cli_streaming_odd_length_and_block_validation(tmp_path):
    """Odd input length streams correctly (tail zero-padded to the block, no
    odd-shape retrace) and matches --full; --block < 1 fails cleanly."""
    from neuralampmodelercore_tpu.cli.render import main as render_main
    from neuralampmodelercore_tpu.utils.audio import read_wav, write_wav_float32

    wav_in = str(tmp_path / "in.wav")
    x = (np.random.default_rng(4).standard_normal(777) * 0.2).astype(np.float32)
    write_wav_float32(wav_in, x, 48000)

    out_s = str(tmp_path / "s.wav")
    rc = render_main([os.path.join(EXAMPLE_MODELS, "wavenet.nam"), wav_in, out_s, "--block", "64"])
    assert rc == 0
    out_f = str(tmp_path / "f.wav")
    rc = render_main([os.path.join(EXAMPLE_MODELS, "wavenet.nam"), wav_in, out_f, "--full"])
    assert rc == 0
    ys, _ = read_wav(out_s)
    yf, _ = read_wav(out_f)
    assert ys.shape == (777,)
    np.testing.assert_allclose(ys, yf, atol=1e-5)

    rc = render_main([os.path.join(EXAMPLE_MODELS, "wavenet.nam"), wav_in, out_s, "--block", "0"])
    assert rc == 1


def test_read_wav_float64(tmp_path):
    """IEEE-float WAVs carry their bit depth: a float64 file must decode to
    the same samples, not be misparsed as pairs of float32s."""
    import struct

    from neuralampmodelercore_tpu.utils.audio import read_wav

    x = (np.random.default_rng(1).standard_normal(256) * 0.3).astype(np.float64)
    raw = x.astype("<f8").tobytes()
    p = str(tmp_path / "f64.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(raw)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 3, 1, 48000, 48000 * 8, 8, 64))
        f.write(b"data")
        f.write(struct.pack("<I", len(raw)))
        f.write(raw)
    y, sr = read_wav(p)
    assert y.shape == (256,) and sr == 48000
    np.testing.assert_allclose(y, x.astype(np.float32), atol=0)


def test_registry_custom_loader_get_has_consistency():
    from neuralampmodelercore_tpu import registry

    registry.register_custom_loader("ExtArch", lambda d: None)
    try:
        assert registry.has_architecture("ExtArch")
        import pytest

        with pytest.raises(ValueError, match="custom loader"):
            registry.get_architecture("ExtArch")
    finally:
        registry._CUSTOM_LOADERS.pop("ExtArch", None)


def test_missing_nam_keys_raise_value_error():
    import pytest

    from neuralampmodelercore_tpu.formats import parse_nam_json

    with pytest.raises(ValueError, match="missing version"):
        parse_nam_json({"architecture": "Linear", "config": {}, "weights": []})
    with pytest.raises(ValueError, match="missing architecture"):
        parse_nam_json({"version": "0.5.4", "config": {}, "weights": []})


def test_readme_bench_table_in_sync():
    """README's bench block must match the committed BENCH_TABLE.md (both are
    generated from the bench artifact; tools/sync_readme_bench.py --check).
    Numbers drifting between README and the bench artifact was VERDICT r3
    ask #4."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "sync_readme_bench.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_mailbox_protocol():
    """Epoch mailbox: direct-into-slab producer writes, mask assembly,
    catch-up for lagged producers, consumed-gated reuse."""
    from neuralampmodelercore_tpu.utils.native import Mailbox

    B, D, F = 5, 4, 8
    mb = Mailbox(B, D, F)
    rng = np.random.default_rng(0)
    blocks = rng.standard_normal((B, F)).astype(np.float32)
    # epoch 0: three streams feed
    for s in range(3):
        assert mb.push(s, blocks[s]) == 0
    mask = np.zeros(B, np.float32)
    assert mb.assemble(0, mask) == 3
    np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(mb.slab(0)[:, 0], blocks[0])
    # stream 3 lagged: its next push catches up to the live epoch (1)
    assert mb.push(3, blocks[3]) == 1
    assert mb.assemble(1, mask) == 1
    np.testing.assert_array_equal(mask, [0, 0, 0, 1, 0])
    # producers can run at most depth-1 epochs ahead of consumption
    for e in range(2, 100):
        if mb.push(0, blocks[0]) < 0:
            break
    assert e < 100  # hit backpressure
    mb.mark_consumed(1)
    assert mb.push(0, blocks[0]) >= 0  # freed one slot
    # consumer gather from a published output
    out = rng.standard_normal((F, B)).astype(np.float32)
    np.testing.assert_array_equal(mb.gather(out, 2), out[:, 2])


def test_stream_farm_multichannel():
    """Farm end-to-end on a 2-in/3-out WaveNet (VERDICT r3 ask #7): blocks
    stream as (C_in, T) in and (C_out, T) out."""
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    config = {
        "in_channels": 2,
        "layers": [
            {
                "input_size": 2, "condition_size": 2, "head_size": 3,
                "channels": 4, "kernel_size": 3, "dilations": [1, 2],
                "activation": "Tanh", "gated": False, "head_bias": True,
            }
        ],
        "head": None,
        "head_scale": 0.5,
    }
    m = nam.load_model(generate.make_nam("WaveNet", config, seed=6, scale=0.2))
    m.prewarm_on_reset = False
    assert m.num_input_channels == 2 and m.num_output_channels == 3
    B, T, n_blocks = 4, 32, 3
    farm = StreamFarm(m, batch=B, block_size=T)
    farm.start()
    rng = np.random.default_rng(8)
    x = (rng.standard_normal((B, 2, n_blocks * T)) * 0.3).astype(np.float32)
    outs = [[] for _ in range(B)]
    for blk in range(n_blocks):
        for b in range(B):
            assert farm.push(b, x[b, :, blk * T : (blk + 1) * T])
        assert farm.dispatch() == B
    farm.flush()
    for b in range(B):
        while True:
            o = farm.pull(b)
            if o is None:
                break
            assert o.shape == (3, T)
            outs[b].append(o)
    got = np.stack([np.concatenate(o, axis=1) for o in outs])  # (B, 3, n*T)
    # reference: direct model processing (B, T, C) convention
    st = m.init_state(B)
    y, _ = m.process(x.transpose(0, 2, 1), st)  # (B, n*T, 3)
    np.testing.assert_allclose(got, np.asarray(y).transpose(0, 2, 1), atol=2e-5)


def test_stream_farm_consumer_lag_drops():
    """A consumer more than `depth` blocks behind skips forward and the skip
    is counted (the farm's xrun counter)."""
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    B, T = 2, 32
    farm = StreamFarm(m, batch=B, block_size=T, queue_depth=4, pipeline=False)
    farm.start()
    rng = np.random.default_rng(9)
    n_blocks = farm.depth + 3
    for blk in range(n_blocks):
        farm.push_range(0, (rng.standard_normal((B, T)) * 0.3).astype(np.float32))
        farm.dispatch()
    # never pulled: the published window slid past the consumer's cursor
    assert farm.pull(0) is not None
    assert farm.dropped == n_blocks - farm.depth


def test_stream_farm_masked_nan_slab_is_exact_zero_input():
    """A non-finite sample sitting in a MASKED stream's slab region (stale
    producer garbage) must not leak into the step: the masked step uses
    jnp.where, not x*mask, so the masked column's input is exact zeros and
    its output is bit-identical to a benign zero-slab run (ADVICE r4)."""
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False

    def run(poison):
        farm = StreamFarm(m, batch=4, block_size=32, queue_depth=4)
        farm.start()
        rng = np.random.default_rng(0)
        blocks = (rng.standard_normal((4, 32)) * 0.1).astype(np.float32)
        for e in range(3):
            if poison:
                farm._mbox.slab(e).reshape(32, 4)[:, 2] = np.nan
            for s in (0, 1, 3):
                farm.push(s, blocks[s])
            farm.dispatch()
        farm.flush()
        return [farm.pull(2) for _ in range(3)]

    clean, poisoned = run(False), run(True)
    for a, b in zip(clean, poisoned):
        assert np.isfinite(b).all()
        np.testing.assert_array_equal(a, b)


def test_xprof_summary_aggregation(tmp_path):
    """tools/xprof_summary.summarise aggregates device-track complete events
    per step and excludes the jit wrapper span from the busy total (it nests
    the custom call — counting both would double the kernel time)."""
    import gzip

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import xprof_summary as xs

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    steps = 4
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
    ]
    for _ in range(steps):
        events += [
            {"ph": "X", "pid": 3, "name": "jit_step(123)", "dur": 2000},
            {"ph": "X", "pid": 3, "name": "_custom_call.1", "dur": 1900},
            {"ph": "X", "pid": 3, "name": "copy.1", "dur": 50},
            {"ph": "X", "pid": 7, "name": "host_thing", "dur": 99999},
        ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    out = xs.summarise(str(tmp_path), steps)
    assert out["device"] == ["/device:TPU:0"]
    # busy total = custom call + copy, NOT + the enclosing jit span, and no
    # host events
    assert out["device_busy_us_per_step"] == 1950.0
    ops = {o["op"]: o["us_per_step"] for o in out["ops"]}
    assert ops["_custom_call.1"] == 1900.0 and "host_thing" not in ops
