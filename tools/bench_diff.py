#!/usr/bin/env python3
"""Compare two Bench JSON lines (files containing the {"metric":...} line)
and print per-query deltas, worst regressions first.

Usage: bench_diff.py OLD_FILE NEW_FILE [threshold_pct]
"""
import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as f:
        m = re.search(r'\{"metric".*\}', f.read())
    if not m:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(m.group(0))


def main(old_path: str, new_path: str, threshold: float = 20.0) -> None:
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((float("inf"), f"  NEW   {name:26s}        -> {b:6.2f}s"))
        elif b is None:
            rows.append((-float("inf"), f"  GONE  {name:26s} {a:6.2f} ->"))
        elif a > 0:
            pct = 100.0 * (b - a) / a
            if abs(pct) >= threshold:
                tag = "SLOWER" if pct > 0 else "faster"
                rows.append((-pct if pct < 0 else pct + 1000 if pct > 0 else 0,
                             f"  {tag} {name:26s} {a:6.2f} -> {b:6.2f}s ({pct:+.0f}%)"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 20.0)
