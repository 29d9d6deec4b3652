"""Independent NumPy reference engine for oracle testing.

This is a SECOND implementation of the .nam model semantics, written directly
from the reference C++ sources (/root/reference/NAM/*) in plain NumPy float32
with stateful per-module history buffers — deliberately structured like the
C++ (per-tap GEMMs over explicit history, per-sample LSTM loop) rather than
like the vectorized JAX path in neuralampmodelercore_tpu. Tests compare the
two implementations on the example models; agreement within float tolerance
validates weight-stream unflattening and compute-graph wiring of both.

Layout convention here matches the C++: (channels, frames) column-major-ish.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


class Reader:
    def __init__(self, weights):
        self.w = np.asarray(weights, dtype=F32).reshape(-1)
        self.pos = 0

    def take(self, n):
        out = self.w[self.pos : self.pos + n]
        assert out.size == n, "ran out of weights"
        self.pos += n
        return out.copy()

    def done(self):
        assert self.pos == self.w.size, f"unused weights: {self.w.size - self.pos}"


# ---------------------------------------------------------------------------
# Activations (reference: NAM/activations.h)
# ---------------------------------------------------------------------------


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x, dtype=F32))


def _fast_tanh(x):
    ax = np.abs(x)
    x2 = x * x
    num = x * (F32(2.45550750702956) + F32(2.45550750702956) * ax + (F32(0.893229853513558) + F32(0.821226666969744) * ax) * x2)
    den = F32(2.44506634652299) + (F32(2.44506634652299) + x2) * np.abs(x + F32(0.814642734961073) * x * ax)
    return num / den


def make_activation(cfg):
    """cfg: string or dict (reference: NAM/activations.cpp:59-130)."""
    if cfg is None:
        return lambda x: x
    if isinstance(cfg, str):
        t, j = cfg, {}
    else:
        t, j = cfg["type"], cfg
    t = {"LeakyHardTanh": "LeakyHardtanh"}.get(t, t)
    if t == "Tanh":
        return np.tanh
    if t == "Hardtanh":
        return lambda x: np.clip(x, -1.0, 1.0)
    if t == "Fasttanh":
        return _fast_tanh
    if t == "ReLU":
        return lambda x: np.maximum(x, 0.0)
    if t == "LeakyReLU":
        ns = F32(j.get("negative_slope", 0.01))
        return lambda x: np.where(x > 0, x, ns * x)
    if t == "PReLU":
        if "negative_slopes" in j:
            slopes = np.asarray(j["negative_slopes"], dtype=F32)
        else:
            slopes = np.asarray([j.get("negative_slope", 0.01)], dtype=F32)

        def prelu(x):
            # x: (channels, frames); slopes per channel (reference applies
            # pos % n with channels fastest).
            c = x.shape[0]
            s = np.tile(slopes, c // len(slopes))[:, None]
            return np.where(x > 0, x, s * x)

        return prelu
    if t == "Sigmoid":
        return _sigmoid
    if t == "SiLU":
        return lambda x: x * _sigmoid(x)
    if t == "Hardswish":
        return lambda x: x * np.clip(x + 3.0, 0.0, 6.0) * F32(1.0 / 6.0)
    if t == "LeakyHardtanh":
        mn, mx = F32(j.get("min_val", -1.0)), F32(j.get("max_val", 1.0))
        ms, xs = F32(j.get("min_slope", 0.01)), F32(j.get("max_slope", 0.01))

        def lht(x):
            return np.where(x < mn, (x - mn) * ms + mn, np.where(x > mx, (x - mx) * xs + mx, x))

        return lht
    if t == "Softsign":
        return lambda x: x / (1.0 + np.abs(x))
    raise ValueError(f"unknown activation {t}")


# ---------------------------------------------------------------------------
# Conv modules (stateful, streaming)
# ---------------------------------------------------------------------------


class Conv1x1:
    """(reference: nam::Conv1x1, NAM/dsp.cpp:311-434)"""

    def __init__(self, reader, cin, cout, bias, groups=1):
        self.cin, self.cout = cin, cout
        self.depthwise = groups == cin and cin == cout
        if self.depthwise:
            self.dw = reader.take(cin)
        else:
            opg, ipg = cout // groups, cin // groups
            self.w = np.zeros((cout, cin), dtype=F32)
            for g in range(groups):
                blk = reader.take(opg * ipg).reshape(opg, ipg)
                self.w[g * opg : (g + 1) * opg, g * ipg : (g + 1) * ipg] = blk
        self.b = reader.take(cout) if bias else None

    def __call__(self, x):
        # x: (cin, T)
        y = (self.dw[:, None] * x) if self.depthwise else (self.w @ x)
        if self.b is not None:
            y = y + self.b[:, None]
        return y.astype(F32)


class Conv1D:
    """Streaming dilated conv with explicit history
    (reference: nam::Conv1D, NAM/conv1d.cpp)."""

    def __init__(self, reader, cin, cout, kernel, dilation, bias, groups=1):
        self.cin, self.cout, self.K, self.d = cin, cout, kernel, dilation
        self.depthwise = groups == cin and cin == cout
        if self.depthwise:
            # (c, k) order
            dw = reader.take(cin * kernel).reshape(cin, kernel)
            self.dw = dw  # [c, k]
        else:
            opg, ipg = cout // groups, cin // groups
            self.w = np.zeros((kernel, cout, cin), dtype=F32)
            for g in range(groups):
                blk = reader.take(opg * ipg * kernel).reshape(opg, ipg, kernel)
                for k in range(kernel):
                    self.w[k, g * opg : (g + 1) * opg, g * ipg : (g + 1) * ipg] = blk[:, :, k]
        self.b = reader.take(cout) if bias else None
        self.rf = (kernel - 1) * dilation
        self.reset()

    def reset(self):
        self.hist = np.zeros((self.cin, self.rf), dtype=F32)

    def __call__(self, x):
        # x: (cin, T) -> (cout, T)
        T = x.shape[1]
        full = np.concatenate([self.hist, x], axis=1)
        y = np.zeros((self.cout, T), dtype=F32)
        for k in range(self.K):
            start = self.rf - (self.K - 1 - k) * self.d
            xk = full[:, start : start + T]
            if self.depthwise:
                y += self.dw[:, k][:, None] * xk
            else:
                y += self.w[k] @ xk
        if self.b is not None:
            y += self.b[:, None]
        if self.rf > 0:
            self.hist = full[:, T : T + self.rf].copy()
        return y.astype(F32)


class FiLM:
    """(reference: nam::FiLM, NAM/film.h)"""

    def __init__(self, reader, cond_dim, input_dim, shift, groups=1):
        self.input_dim = input_dim
        self.shift = shift
        self.cond = Conv1x1(reader, cond_dim, (2 if shift else 1) * input_dim, True, groups)

    def __call__(self, x, condition):
        ss = self.cond(condition)
        scale = ss[: self.input_dim]
        if self.shift:
            return (x * scale + ss[self.input_dim :]).astype(F32)
        return (x * scale).astype(F32)


# ---------------------------------------------------------------------------
# WaveNet (reference: NAM/wavenet/{model,detail}.cpp)
# ---------------------------------------------------------------------------

_FILM_SITES = (
    "conv_pre_film",
    "conv_post_film",
    "input_mixin_pre_film",
    "input_mixin_post_film",
    "activation_pre_film",
    "activation_post_film",
    "layer1x1_post_film",
    "head1x1_post_film",
)


def _film_cfg(lc, key):
    v = lc.get(key)
    if v is None or v is False:
        return None
    return {"active": v.get("active", True), "shift": v.get("shift", True), "groups": v.get("groups", 1)}


class WNLayer:
    def __init__(self, reader, lc, i, channels, bottleneck, cond_size, kernel, dilation,
                 act_cfg, gating_mode, sec_cfg, groups_input, groups_mixin,
                 layer1x1, head1x1, films):
        self.gating = gating_mode
        self.bn = bottleneck
        zc = 2 * bottleneck if gating_mode != "none" else bottleneck
        self.conv = Conv1D(reader, channels, zc, kernel, dilation, True, groups_input)
        self.mixin = Conv1x1(reader, cond_size, zc, False, groups_mixin)
        self.layer1x1 = None
        self.head1x1 = None
        if layer1x1["active"]:
            self.layer1x1 = Conv1x1(reader, bottleneck, channels, True, layer1x1["groups"])
        if head1x1["active"]:
            self.head1x1 = Conv1x1(reader, bottleneck, head1x1["out_channels"], True, head1x1["groups"])
        self.films = {}
        dims = {
            "conv_pre_film": channels,
            "conv_post_film": zc,
            "input_mixin_pre_film": cond_size,
            "input_mixin_post_film": zc,
            "activation_pre_film": zc,
            "activation_post_film": bottleneck,
            "layer1x1_post_film": channels,
            "head1x1_post_film": head1x1["out_channels"],
        }
        for site in _FILM_SITES:
            fc = films[site]
            if fc is not None and fc["active"]:
                if site == "layer1x1_post_film" and self.layer1x1 is None:
                    continue
                if site == "head1x1_post_film" and self.head1x1 is None:
                    continue
                self.films[site] = FiLM(reader, cond_size, dims[site], fc["shift"], fc["groups"])
        self.act = make_activation(act_cfg)
        self.sec_act = make_activation(sec_cfg)

    def __call__(self, x, cond):
        # (reference: Layer::Process, model.cpp:166-376)
        h = self.films["conv_pre_film"](x, cond) if "conv_pre_film" in self.films else x
        c = self.conv(h)
        if "conv_post_film" in self.films:
            c = self.films["conv_post_film"](c, cond)
        m_in = self.films["input_mixin_pre_film"](cond, cond) if "input_mixin_pre_film" in self.films else cond
        m = self.mixin(m_in)
        if "input_mixin_post_film" in self.films:
            m = self.films["input_mixin_post_film"](m, cond)
        z = (c + m).astype(F32)
        if "activation_pre_film" in self.films:
            z = self.films["activation_pre_film"](z, cond)
        bn = self.bn
        if self.gating == "none":
            a = self.act(z).astype(F32)
        elif self.gating == "gated":
            a = (self.act(z[:bn]) * self.sec_act(z[bn:])).astype(F32)
        else:  # blended
            alpha = self.sec_act(z[bn:]).astype(F32)
            a = (alpha * self.act(z[:bn]) + (1.0 - alpha) * z[:bn]).astype(F32)
        if "activation_post_film" in self.films:
            a = self.films["activation_post_film"](a, cond)
        if self.layer1x1 is not None:
            l = self.layer1x1(a)
            # layer1x1_post_film applied ONLY in blended mode (model.cpp:262-270)
            if self.gating == "blended" and "layer1x1_post_film" in self.films:
                l = self.films["layer1x1_post_film"](l, cond)
            nxt = (x + l).astype(F32)
        else:
            nxt = x
        if self.head1x1 is not None:
            hd = self.head1x1(a)
            if "head1x1_post_film" in self.films:
                hd = self.films["head1x1_post_film"](hd, cond)
        else:
            hd = a
        return nxt, hd


class WNLayerArray:
    def __init__(self, reader, lc, index):
        channels = lc["channels"]
        bottleneck = lc.get("bottleneck", channels)
        cond_size = lc["condition_size"]
        input_size = lc["input_size"]
        dil = lc["dilations"]
        n = len(dil)
        # kernel sizes
        if "kernel_sizes" in lc:
            ks = list(lc["kernel_sizes"])
        else:
            ks = [lc["kernel_size"]] * n
        # activations
        aj = lc["activation"]
        acts = list(aj) if isinstance(aj, list) else [aj] * n
        # gating + secondary
        if "gating_mode" in lc:
            gj = lc["gating_mode"]
            gm = [str(g) for g in gj] if isinstance(gj, list) else [str(gj)] * n
            sj = lc.get("secondary_activation")
            secs = []
            for i, g in enumerate(gm):
                if g == "none":
                    secs.append(None)
                elif sj is None:
                    secs.append("Sigmoid")
                elif isinstance(sj, list):
                    secs.append(sj[i])
                else:
                    secs.append(sj)
        elif lc.get("gated", False):
            gm, secs = ["gated"] * n, ["Sigmoid"] * n
        else:
            gm, secs = ["none"] * n, [None] * n
        layer1x1 = lc.get("layer1x1", {"active": True, "groups": 1})
        head1x1 = lc.get("head1x1", {"active": False, "out_channels": channels, "groups": 1})
        films = {site: _film_cfg(lc, site) for site in _FILM_SITES}

        # head rechannel config
        if lc.get("head") is not None:
            hj = lc["head"]
            head_size = hj["out_channels"]
            head_k = hj["kernel_size"]
            head_dil = hj.get("head_dilation", 1)
            head_bias = hj["bias"]
        else:
            head_size = lc["head_size"]
            head_k, head_dil = 1, 1
            head_bias = lc["head_bias"]

        self.rechannel = Conv1x1(reader, input_size, channels, False)
        self.layers = [
            WNLayer(reader, lc, i, channels, bottleneck, cond_size, ks[i], dil[i],
                    acts[i], gm[i], secs[i], lc.get("groups_input", 1),
                    lc.get("groups_input_mixin", 1), layer1x1, head1x1, films)
            for i in range(n)
        ]
        head_out_size = head1x1["out_channels"] if head1x1["active"] else bottleneck
        self.head_out_size = head_out_size
        self.head_rechannel = Conv1D(reader, head_out_size, head_size, head_k, head_dil, head_bias)

    def receptive_field(self):
        rf = sum(l.conv.rf for l in self.layers)
        return rf + self.head_rechannel.rf

    def __call__(self, x, cond, head_in):
        x = self.rechannel(x)
        acc = head_in.copy()
        for l in self.layers:
            x, hd = l(x, cond)
            acc = (acc + hd).astype(F32)
        return x, self.head_rechannel(acc)


class RefWaveNet:
    def __init__(self, nam_json):
        cfg = nam_json["config"]
        self.condition = build_ref_model(cfg["condition_dsp"]) if cfg.get("condition_dsp") else None
        reader = Reader(nam_json["weights"])
        self.arrays = [WNLayerArray(reader, lc, i) for i, lc in enumerate(cfg["layers"])]
        self.head_convs = None
        if cfg.get("head") is not None:
            hj = cfg["head"]
            self.head_act = make_activation(hj["activation"])
            cin = cfg["layers"][-1]["head_size"] if "head_size" in cfg["layers"][-1] else cfg["layers"][-1]["head"]["out_channels"]
            convs = []
            n = len(hj["kernel_sizes"])
            for i, k in enumerate(hj["kernel_sizes"]):
                cout = hj["out_channels"] if i + 1 == n else hj["channels"]
                convs.append(Conv1D(reader, cin, cout, k, 1, True))
                cin = cout
            self.head_convs = convs
        self.head_scale = F32(reader.take(1)[0])
        reader.done()
        self.in_channels = cfg.get("in_channels", 1)

    def prewarm_samples(self):
        n = self.condition.prewarm_samples() if self.condition else 1
        n += sum(a.receptive_field() for a in self.arrays)
        if self.head_convs is not None:
            n += sum(c.K - 1 for c in self.head_convs)
        return n

    def __call__(self, x):
        # x: (cin, T)
        cond_in = x.astype(F32)
        cond_out = self.condition(cond_in) if self.condition else cond_in
        layer_out = cond_in
        head = np.zeros((self.arrays[0].head_out_size, x.shape[1]), dtype=F32)
        for a in self.arrays:
            layer_out, head = a(layer_out, cond_out, head)
        if self.head_convs is not None:
            work = (self.head_scale * head).astype(F32)
            for conv in self.head_convs:
                work = conv(self.head_act(work).astype(F32))
            return work
        return (self.head_scale * head).astype(F32)


# ---------------------------------------------------------------------------
# LSTM (reference: NAM/lstm.cpp) — strictly per-sample
# ---------------------------------------------------------------------------


class RefLSTM:
    def __init__(self, nam_json):
        cfg = nam_json["config"]
        reader = Reader(nam_json["weights"])
        self.H = cfg["hidden_size"]
        self.layers = []
        for li in range(cfg["num_layers"]):
            isz = cfg["input_size"] if li == 0 else self.H
            w = reader.take(4 * self.H * (isz + self.H)).reshape(4 * self.H, isz + self.H)
            b = reader.take(4 * self.H)
            h0 = reader.take(self.H)
            c0 = reader.take(self.H)
            self.layers.append({"w": w, "b": b, "h": h0.copy(), "c": c0.copy()})
        out = cfg.get("out_channels", 1)
        self.head_w = reader.take(out * self.H).reshape(out, self.H)
        self.head_b = reader.take(out)
        reader.done()
        self.in_channels = cfg.get("in_channels", 1)
        self.sr = nam_json.get("sample_rate", -1)

    def prewarm_samples(self):
        n = int(0.5 * self.sr)
        return n if n > 0 else 1

    def __call__(self, x):
        # x: (cin, T)
        T = x.shape[1]
        out = np.zeros((self.head_w.shape[0], T), dtype=F32)
        H = self.H
        for t in range(T):
            inp = x[:, t]
            for L in self.layers:
                xh = np.concatenate([inp, L["h"]]).astype(F32)
                ifgo = (L["w"] @ xh + L["b"]).astype(F32)
                i, f, g, o = ifgo[:H], ifgo[H : 2 * H], ifgo[2 * H : 3 * H], ifgo[3 * H :]
                L["c"] = (_sigmoid(f) * L["c"] + _sigmoid(i) * np.tanh(g)).astype(F32)
                L["h"] = (_sigmoid(o) * np.tanh(L["c"])).astype(F32)
                inp = L["h"]
            out[:, t] = self.head_w @ inp + self.head_b
        return out


# ---------------------------------------------------------------------------
# ConvNet (reference: NAM/convnet.cpp)
# ---------------------------------------------------------------------------


class RefConvNet:
    def __init__(self, nam_json):
        cfg = nam_json["config"]
        reader = Reader(nam_json["weights"])
        channels = cfg["channels"]
        self.dilations = cfg["dilations"]
        bn = cfg["batchnorm"]
        act = make_activation(cfg["activation"])
        groups = cfg.get("groups", 1)
        cin = cfg.get("in_channels", 1)
        self.in_channels = cin
        self.blocks = []
        for i, d in enumerate(self.dilations):
            conv = Conv1D(reader, cin if i == 0 else channels, channels, 2, d, not bn, groups)
            if bn:
                mean = reader.take(channels)
                var = reader.take(channels)
                w = reader.take(channels)
                b = reader.take(channels)
                eps = reader.take(1)[0]
                scale = (w / np.sqrt(eps + var)).astype(F32)
                loc = (b - scale * mean).astype(F32)
            else:
                scale, loc = None, None
            self.blocks.append((conv, scale, loc, act))
        out = cfg.get("out_channels", 1)
        self.head_w = reader.take(out * channels).reshape(out, channels)
        self.head_b = reader.take(out)
        reader.done()

    def prewarm_samples(self):
        return 1 + sum(self.dilations)

    def __call__(self, x):
        h = x.astype(F32)
        for conv, scale, loc, act in self.blocks:
            h = conv(h)
            if scale is not None:
                h = (h * scale[:, None] + loc[:, None]).astype(F32)
            h = act(h).astype(F32)
        return (self.head_w @ h + self.head_b[:, None]).astype(F32)


# ---------------------------------------------------------------------------
# Linear (reference: NAM/linear.cpp, direct path)
# ---------------------------------------------------------------------------


class RefLinear:
    def __init__(self, nam_json):
        cfg = nam_json["config"]
        reader = Reader(nam_json["weights"])
        self.rf = cfg["receptive_field"]
        self.ir = reader.take(self.rf)  # w[0] = current-sample tap
        self.bias = reader.take(1)[0] if cfg["bias"] else F32(0.0)
        reader.done()
        self.in_channels = cfg.get("in_channels", 1)
        self.out_channels = cfg.get("out_channels", 1)
        self.hist = np.zeros((self.in_channels, self.rf - 1), dtype=F32)

    def prewarm_samples(self):
        return 0

    def __call__(self, x):
        n = min(self.in_channels, self.out_channels)
        T = x.shape[1]
        full = np.concatenate([self.hist, x.astype(F32)], axis=1)
        y = np.zeros((self.out_channels, T), dtype=F32)
        for ch in range(n):
            for t in range(T):
                window = full[ch, t : t + self.rf]  # oldest..newest
                y[ch, t] = self.bias + np.dot(self.ir[::-1], window)
        if self.rf > 1:
            self.hist = full[:, T:].copy()
        return y


# ---------------------------------------------------------------------------
# Dispatch / streaming harness
# ---------------------------------------------------------------------------


def build_ref_model(nam_json):
    arch = nam_json["architecture"]
    if arch == "WaveNet":
        return RefWaveNet(nam_json)
    if arch == "LSTM":
        return RefLSTM(nam_json)
    if arch == "ConvNet":
        return RefConvNet(nam_json)
    if arch == "Linear":
        return RefLinear(nam_json)
    if arch == "SlimmableContainer":
        # Default active = last submodel.
        return build_ref_model(nam_json["config"]["submodels"][-1]["model"])
    raise ValueError(f"ref engine: unsupported architecture {arch}")


def ref_render(nam_json, x, block_size=64, prewarm=True):
    """Stream x (T,) through the model in blocks (like tools/render.cpp):
    prewarm with zeros, then process block-by-block. Returns (T,) float32."""
    model = build_ref_model(nam_json)
    if prewarm:
        n = model.prewarm_samples()
        bs = 4096
        while n > 0:
            take = min(bs, n)
            model(np.zeros((model.in_channels, take), dtype=F32))
            n -= take
    x = np.asarray(x, dtype=F32).reshape(1, -1)
    outs = []
    for i in range(0, x.shape[1], block_size):
        outs.append(model(x[:, i : i + block_size]))
    return np.concatenate(outs, axis=1)[0]
