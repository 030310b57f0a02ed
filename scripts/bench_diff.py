"""Compare two bench JSON outputs (e.g. BENCH_r03.json vs
BENCH_r04.json, or two ad-hoc bench.py captures): prints headline
delta and per-query regressions/improvements beyond a threshold.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--pct 25]
"""

import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pct = 25.0
    if "--pct" in sys.argv:
        pct = float(sys.argv[sys.argv.index("--pct") + 1])
    def load(path):
        d = json.load(open(path))
        # driver BENCH_r{N}.json wraps the bench line under "parsed"
        # (older rounds truncated it to a tail string -> treat as
        # empty; use the repo's benchmarks/*.json snapshots instead)
        if isinstance(d, dict) and "parsed" in d:
            d = d["parsed"] or {}
        return d if isinstance(d, dict) else {}

    old = load(args[0])
    new = load(args[1])

    def headline(d):
        return d.get("value"), d.get("docs_per_sec")

    ov, od = headline(old)
    nv, nd = headline(new)
    if ov and nv:
        print(
            f"headline: {ov:.2f}s -> {nv:.2f}s "
            f"({(nv - ov) / ov * 100:+.1f}%)"
            + (f"  [{od} -> {nd} docs/s]" if od and nd else "")
        )
    oq = old.get("queries", {}) or {}
    nq = new.get("queries", {}) or {}
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  "
          f"new-only: {len(set(nq) - set(oq))}  "
          f"removed: {len(set(oq) - set(nq))}")
    rows = []
    for q in shared:
        a, b = oq[q], nq[q]
        if a <= 0:
            continue
        d = (b - a) / a * 100
        if abs(d) >= pct and abs(b - a) >= 0.5:
            rows.append((d, q, a, b))
    for d, q, a, b in sorted(rows):
        print(f"{q:32s} {a:7.2f}s -> {b:7.2f}s  ({d:+.0f}%)")
    if not rows:
        print(f"no per-query deltas beyond {pct}% / 0.5s")


if __name__ == "__main__":
    main()
