#!/usr/bin/env python3
"""Compare two Bench JSON files and print per-query deltas, worst
regressions first.

When BOTH files carry calibration probes (BENCH_FULL.json shape, round
11+), deltas are also CONTEXT-CORRECTED: each run's cpu and shuffle
probe medians measure how fast this machine ran constant synthetic work
during that bench, so dividing a query's new time by the matching probe
ratio (cpu probe for cpu-bound queries, shuffle probe for
shuffle-heavy ones, classified by the run's own shuffle-write counter)
removes run-context drift (page cache, CPU contention, thermal state)
before flagging a regression. Raw deltas stay in the table — the
corrected column is for deciding "code or weather", the raw one for
"what will the next round's total look like".

When BOTH files carry per-query [min,max] spreads (BENCH_FULL.json
shape), regressions are additionally SIGNIFICANCE-GATED: a query is
flagged REAL only when its new MIN exceeds its old MAX by the margin
(default 10%) — i.e. the intervals don't overlap, so no draw from the
old regime explains any draw from the new one. Probes swing +/-30%
within a run, so single-probe correction is directional only; the
interval test is what separates "code" from "weather" mechanically
(round 12's two real findings were exactly non-overlapping intervals,
and its false alarms were all overlap).

Usage: bench_diff.py OLD_FILE NEW_FILE [threshold_pct] [margin_pct]
"""
import json
import math
import re
import sys

# a query whose bench run shuffled more than this many bytes is
# normalized by the shuffle probe; below it, by the cpu probe
SHUFFLE_HEAVY_BYTES = 5_000_000

# significance margin: new-min must beat old-max by this factor before
# a regression is called REAL (small enough to catch 1.2x+ shifts,
# large enough that timer jitter on sub-second rows never trips it)
DEFAULT_MARGIN = 1.10


def load(path: str) -> dict:
    text = open(path).read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(m.group(0))


def probe_median(probes: dict, kind: str) -> float:
    # geometric mean of the first and last probe: the run warms as it
    # goes (r11 measured cpu 0.514 -> 0.324), so a single end is biased
    a, b = probes.get(f"{kind}_first"), probes.get(f"{kind}_last")
    if not a or not b or a <= 0 or b <= 0:
        return 0.0
    return math.sqrt(a * b)


def main(old_path: str, new_path: str, threshold: float = 20.0,
         margin: float = DEFAULT_MARGIN) -> None:
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    ospread, nspread = old.get("spread") or {}, new.get("spread") or {}
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")

    # probe ratios: factor > 1 means the NEW run's machine context was
    # slower for that work class, so new times are deflated by it
    factors = {}
    op, np_ = old.get("probes"), new.get("probes")
    if op and np_:
        for kind in ("cpu", "shuffle"):
            o, n = probe_median(op, kind), probe_median(np_, kind)
            if o > 0 and n > 0:
                factors[kind] = n / o
        if factors:
            print("probe context (new/old): " + ", ".join(
                f"{k}={v:.3f}" for k, v in sorted(factors.items())))

    # classify by the new run's shuffle-write bytes (fall back to old's)
    resource = new.get("resource") or old.get("resource") or {}

    def cls(name: str) -> str:
        row = resource.get(name)
        return "shuffle" if row and row[2] >= SHUFFLE_HEAVY_BYTES else "cpu"

    rows = []
    corr_total_old = corr_total_new = 0.0
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((float("inf"), f"  NEW   {name:26s}        -> {b:6.2f}s"))
            continue
        if b is None:
            rows.append((-float("inf"), f"  GONE  {name:26s} {a:6.2f} ->"))
            continue
        if a <= 0:
            continue
        pct = 100.0 * (b - a) / a
        f = factors.get(cls(name), 1.0)
        bc = b / f
        cpct = 100.0 * (bc - a) / a
        corr_total_old += a
        corr_total_new += bc
        # flag on the CORRECTED delta when probes exist, raw otherwise
        flag = cpct if factors else pct
        if abs(flag) >= threshold:
            tag = "SLOWER" if flag > 0 else "faster"
            corr = (f" corrected {cpct:+.0f}% [{cls(name)}]" if factors else "")
            # significance: intervals [old_min,old_max] / [new_min,new_max]
            # must be disjoint (by `margin`) in the flagged direction,
            # else the shift is explainable as in-round variance
            sig = ""
            os_, ns_ = ospread.get(name), nspread.get(name)
            if os_ and ns_:
                if flag > 0:
                    real = ns_[0] > os_[1] * margin
                else:
                    real = os_[0] > ns_[1] * margin
                sig = (" REAL (spreads disjoint)" if real
                       else f" weather? (spreads overlap:"
                            f" old[{os_[0]:.2f}..{os_[1]:.2f}]"
                            f" new[{ns_[0]:.2f}..{ns_[1]:.2f}])")
                if flag > 0 and not real:
                    # demote unconfirmed regressions below confirmed ones
                    flag -= 500
            rows.append((flag + 1000 if flag > 0 else -flag,
                         f"  {tag} {name:26s} {a:6.2f} -> {b:6.2f}s "
                         f"({pct:+.0f}%{corr}){sig}"))
    if factors and corr_total_old > 0:
        print(f"context-corrected total: {corr_total_old:.1f}s -> "
              f"{corr_total_new:.1f}s "
              f"({100.0 * (corr_total_new - corr_total_old) / corr_total_old:+.1f}%)")
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 20.0,
         1.0 + float(sys.argv[4]) / 100.0 if len(sys.argv) > 4
         else DEFAULT_MARGIN)
