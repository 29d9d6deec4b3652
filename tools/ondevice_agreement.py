"""On-device (TPU) agreement sweep: fused Pallas kernel vs XLA engine step.

Interpret-mode tests (tests/test_pallas_stack.py) execute DMAs synchronously
and cannot surface on-device ordering races; this sweep runs the real kernel
on the TPU against the XLA engine on identical state/input and gates at the
reference's implementation-equivalence tolerance (5e-5,
tools/test/test_a2_fast.cpp:276-278). Covers every kernel feature:
tail layers, ring layers, FiLM sites, grouped/depthwise convs, the A2 k=16
head conv, the post-stack head, nested condition DSP - each at H=2 (B=256)
and H=4 (B=512) half-tile counts.

Usage: python tools/ondevice_agreement.py [--blocks N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

EXAMPLE_MODELS = "/root/reference/example_models"

POST_HEAD_CONFIG = {
    "layers": [
        {
            "input_size": 1, "condition_size": 1, "channels": 6, "head_size": 4,
            "kernel_size": 3, "dilations": [1, 4, 16, 64], "activation": "Tanh",
            "gated": False, "head_bias": True,
        }
    ],
    "head": {"channels": 5, "out_channels": 1, "kernel_sizes": [3, 1, 4], "activation": "ReLU"},
}

DEPTHWISE_CONFIG = {
    "layers": [
        {
            "input_size": 1, "condition_size": 1, "channels": 8, "head_size": 2,
            "kernel_size": 3, "dilations": [1, 2, 4, 128], "activation": "SiLU",
            "gated": False, "head_bias": False, "groups_input": 8,
            "layer1x1": {"active": True, "groups": 8},
        }
    ],
    "head": None,
}


def models():
    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.tools.generate import make_nam

    out = []
    for name in ("wavenet", "wavenet_a1_standard", "wavenet_condition_dsp", "wavenet_a2_max"):
        out.append((name, nam.load_model(os.path.join(EXAMPLE_MODELS, name + ".nam"))))
    a2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "A2.nam"))
    out.append(("A2_nano", a2.active_model))
    a2b = nam.load_model(os.path.join(EXAMPLE_MODELS, "A2.nam"))
    a2b.set_slimmable_size(1.0)
    out.append(("A2_standard", a2b.active_model))
    out.append(("post_head", nam.load_model(make_nam("WaveNet", POST_HEAD_CONFIG, seed=11))))
    out.append(("depthwise", nam.load_model(make_nam("WaveNet", DEPTHWISE_CONFIG, seed=12))))
    out.append(("lstm", nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))))
    out.append((
        "lstm_2x8",
        nam.load_model(make_nam(
            "LSTM",
            {"num_layers": 2, "input_size": 1, "hidden_size": 8, "out_channels": 1},
            seed=13,
        )),
    ))
    out.append((
        "convnet",
        nam.load_model(make_nam(
            "ConvNet",
            {"channels": 16, "dilations": [1, 2, 4, 8, 16, 32, 64, 128, 256, 512],
             "batchnorm": True, "activation": "Tanh"},
            seed=7,
        )),
    ))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--batches", default="256,512")
    ap.add_argument("--atol", type=float, default=5e-5)
    ap.add_argument("--json", default=None,
                    help="write per-config max-abs-diff results to this path "
                         "(the committed round artifact, VERDICT r4 ask #7)")
    args = ap.parse_args(argv)

    from neuralampmodelercore_tpu.models.engine import StreamEngine
    from neuralampmodelercore_tpu.ops.pallas import backend_for

    T = args.block_size
    ok = True
    results = {}
    for B in (int(b) for b in args.batches.split(",")):
        for name, model in models():
            model.prewarm_on_reset = False
            reason = backend_for(model.config).supports(model.config, T, B)
            if reason is not None:
                print(f"SKIP {name:22s} B={B}: {reason}", flush=True)
                results[f"{name}@B{B}"] = {"skipped": reason}
                continue
            ex = StreamEngine(model, batch=B, block_size=T, kernel="xla")
            ep = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
            sx, sp = ex.reset(prewarm=False), ep.reset(prewarm=False)
            rng = np.random.default_rng(0)
            C = model.num_input_channels
            worst = 0.0
            for i in range(args.blocks):
                x = (rng.standard_normal((B, T, C)) * 0.3).astype(np.float32)
                if C == 1:
                    x = x[:, :, 0]
                yx, sx = ex.process(x, sx)
                yp, sp = ep.process(x, sp)
                worst = max(worst, float(np.abs(np.asarray(yx) - np.asarray(yp)).max()))
            status = "OK " if worst <= args.atol else "FAIL"
            if worst > args.atol:
                ok = False
            results[f"{name}@B{B}"] = {"max_abs_diff": worst, "ok": worst <= args.atol}
            print(f"{status} {name:22s} B={B} H={B // 128}: max abs diff {worst:.2e}", flush=True)
    if args.json:
        import json

        doc = {"block_size": T, "atol": args.atol, "blocks": args.blocks,
               "all_ok": ok, "configs": results}
        with open(args.json, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"# wrote {args.json}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
