"""render: load a .nam model, process a WAV, write the result.

The ground-truth-compatible CLI (reference: tools/render.cpp:64-206):
  render MODEL.nam INPUT.wav OUTPUT.wav [--slim V] [--block N] [--full]

Mirrors the reference flow: load -> optional SetSlimmableSize -> load mono
WAV (sample rate must match the model within 0.5 Hz, render.cpp:139-144) ->
Reset(sr, 64) with prewarm -> stream 64-frame blocks -> write float32 WAV.
``--full`` renders the whole sequence in one jitted call instead (identical
output by block-size invariance; much faster offline).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-render", description=__doc__)
    ap.add_argument("model", help=".nam model file")
    ap.add_argument("input", help="input WAV (mono)")
    ap.add_argument("output", help="output WAV (float32)")
    ap.add_argument("--slim", type=float, default=None, help="slimmable size in [0,1]")
    ap.add_argument("--block", type=int, default=64, help="streaming block size (default 64)")
    ap.add_argument("--full", action="store_true", help="single full-sequence call instead of streaming")
    args = ap.parse_args(argv)

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.container import SlimmableModelMixin
    from neuralampmodelercore_tpu.utils.audio import read_wav, write_wav_float32

    model = nam.load_model(args.model)

    x, sr = read_wav(args.input)
    if x.ndim != 1:
        print("render: input WAV must be mono", file=sys.stderr)
        return 1

    # Sample-rate gate (reference: render.cpp:139-144).
    expected = model.expected_sample_rate
    if expected > 0 and abs(expected - sr) > 0.5:
        print(
            f"render: input sample rate {sr} doesn't match model expected rate {expected}",
            file=sys.stderr,
        )
        return 1

    if args.block < 1:
        print(f"render: --block must be >= 1 (got {args.block})", file=sys.stderr)
        return 1

    # Select the submodel BEFORE reset: resetting first compiles+prewarms the
    # default full-size submodel only to throw that state away.
    if args.slim is not None:
        if not isinstance(model, SlimmableModelMixin):
            print("render: model is not slimmable; --slim ignored", file=sys.stderr)
        else:
            try:
                model.set_slimmable_size(args.slim)
            except ValueError as e:
                print(f"render: {e}", file=sys.stderr)
                return 1

    if args.full:
        y = np.asarray(model.render(x))
    elif len(x) == 0:
        y = x
    else:
        state = model.reset(batch=1, sample_rate=sr, max_buffer_size=args.block)
        outs = []
        for i in range(0, len(x), args.block):
            blk = x[i : i + args.block]
            if len(blk) < args.block:
                # Zero-pad the tail to the block size: a one-off odd shape
                # would force a fresh trace+compile just for the last block.
                blk = np.pad(blk, (0, args.block - len(blk)))
            yb, state = model.process(blk[None], state)
            outs.append(np.asarray(yb)[0])
        y = np.concatenate(outs)[: len(x)]

    write_wav_float32(args.output, y, int(sr))
    print(f"rendered {len(x)} samples -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
