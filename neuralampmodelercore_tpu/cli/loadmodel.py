"""loadmodel: smoke-test loading a .nam file.

(reference: tools/loadmodel.cpp:6-33)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-loadmodel", description=__doc__)
    ap.add_argument("model")
    args = ap.parse_args(argv)
    import neuralampmodelercore_tpu as nam

    m = nam.load_model(args.model)
    extras = []
    if hasattr(m, "num_params"):
        extras.append(f"{m.num_params()} params")
    if getattr(m, "expected_sample_rate", -1) > 0:
        extras.append(f"{m.expected_sample_rate:.0f} Hz")
    print(
        f"Loaded {args.model}: {type(m).__name__} ({getattr(m, 'architecture', '?')}), "
        f"{m.num_input_channels} in / {m.num_output_channels} out"
        + (", " + ", ".join(extras) if extras else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
