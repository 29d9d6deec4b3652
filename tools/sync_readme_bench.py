"""Splice the bench-generated performance table into README.md.

bench.py writes BENCH_TABLE.md from the measured result (bench.py
_write_table); this tool replaces everything between the BENCH:BEGIN /
BENCH:END markers in README.md with that table, so README numbers cannot
drift from the committed bench artifact (VERDICT r3 ask #4).
tests/test_tools.py asserts the README block matches BENCH_TABLE.md.

Usage:
    python tools/sync_readme_bench.py            # splice BENCH_TABLE.md
    python tools/sync_readme_bench.py --from-json BENCH_rNN.json
        # regenerate BENCH_TABLE.md from a bench artifact first
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")
TABLE = os.path.join(REPO, "BENCH_TABLE.md")
BEGIN = "<!-- BENCH:BEGIN"
END = "<!-- BENCH:END -->"


def splice(readme_text: str, table_text: str) -> str:
    pattern = re.compile(
        r"(<!-- BENCH:BEGIN[^\n]*-->\n).*?(<!-- BENCH:END -->)", re.DOTALL
    )
    if not pattern.search(readme_text):
        raise SystemExit("README.md has no BENCH:BEGIN/END markers")
    return pattern.sub(lambda m: m.group(1) + table_text.strip() + "\n" + m.group(2),
                       readme_text, count=1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--from-json", default=None,
                    help="bench artifact (e.g. BENCH_r03.json) to regenerate the table from")
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README is out of sync instead of rewriting it")
    args = ap.parse_args(argv)

    if args.from_json:
        with open(args.from_json) as f:
            doc = json.load(f)
        out = doc.get("parsed", doc)  # driver artifacts wrap the JSON line
        sys.path.insert(0, REPO)
        import bench

        bench._write_table(out)

    with open(TABLE) as f:
        table = f.read()
    with open(README) as f:
        readme = f.read()
    new = splice(readme, table)
    if args.check:
        if new != readme:
            print("README.md bench table is OUT OF SYNC with BENCH_TABLE.md")
            return 1
        print("README.md bench table in sync")
        return 0
    if new != readme:
        with open(README, "w") as f:
            f.write(new)
        print("README.md bench table updated")
    else:
        print("README.md bench table already in sync")
    return 0


if __name__ == "__main__":
    sys.exit(main())
