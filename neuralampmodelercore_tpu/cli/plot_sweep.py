"""plot_sweep: plot nam-bench-sweep CSV output (streams vs channel width).

The analog of the reference's plot_wavenet_a1_benchmark.py (reference:
tools/plot_wavenet_a1_benchmark.py — time vs channel count). Here the
measured quantity is real-time 48 kHz streams per chip vs the a1-family
channel width, plus per-block time at the max batch.

    nam-bench-sweep > sweep.csv
    nam-plot-sweep sweep.csv sweep.png
"""

from __future__ import annotations

import argparse
import csv
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-plot-sweep", description=__doc__)
    ap.add_argument("csv", help="CSV from nam-bench-sweep")
    ap.add_argument("output", help="output image (png/svg/pdf)")
    args = ap.parse_args(argv)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("plot_sweep: matplotlib is required", file=sys.stderr)
        return 1

    rows = []
    with open(args.csv) as f:
        for row in csv.DictReader(l for l in f if not l.startswith("#")):
            rows.append(
                (int(row["channels"]), int(row["weights"]),
                 int(row["rt_streams"]), float(row["us_per_block_at_max"]))
            )
    if not rows:
        print("plot_sweep: no data rows", file=sys.stderr)
        return 1
    rows.sort()
    ch = [r[0] for r in rows]
    streams = [r[2] for r in rows]
    us = [r[3] for r in rows]

    fig, ax1 = plt.subplots(figsize=(7, 4.5))
    ax1.plot(ch, streams, "o-", color="tab:blue", label="real-time streams/chip")
    ax1.set_xlabel("channels (first layer array; a1 family)")
    ax1.set_ylabel("real-time 48 kHz streams/chip", color="tab:blue")
    ax1.tick_params(axis="y", labelcolor="tab:blue")
    ax1.grid(True, alpha=0.3)

    ax2 = ax1.twinx()
    ax2.plot(ch, us, "s--", color="tab:red", label="us/block at max batch")
    ax2.set_ylabel("per-block time at max batch (us)", color="tab:red")
    ax2.tick_params(axis="y", labelcolor="tab:red")

    ax1.set_title("WaveNet a1-family width sweep")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output} ({len(rows)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
