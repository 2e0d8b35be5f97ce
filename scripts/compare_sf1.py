#!/usr/bin/env python
"""Adjudicate sf1 bench deltas: new disciplined artifact vs prior rounds.

Usage: python scripts/compare_sf1.py NEW.json OLD.json [threshold]
Prints queries whose new min exceeds old by >= threshold (default 1.5x),
with isolated numbers when present, plus warm>cold inversion checks on
the NEW artifact (the r6 sf1 artifact's tell of contention).
"""
import json
import sys


def main() -> int:
    new = json.load(open(sys.argv[1]))
    old = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    nq, oq = new["queries"], old["queries"]
    iso = new.get("isolated", {})
    print(f"new: {new.get('n_queries')} queries, total {new.get('value')}s, "
          f"passes {new.get('passes')}; old total {old.get('value')}s")
    inversions = []
    for name, warm in new["queries"].items():
        c = new.get("cold_pass", {}).get(name)
        if c is not None and warm > c * 1.3 and warm - c > 0.5:
            inversions.append((name, warm, c))
    print(f"warm>cold inversions (warm > 1.3x cold, >0.5s): {len(inversions)}")
    for name, warm, c in sorted(inversions, key=lambda t: -(t[1] - t[2]))[:10]:
        print(f"  INVERT {name}: warm_min {warm} vs cold {c}")
    regs = []
    for name, v in nq.items():
        o = oq.get(name)
        if o and o > 0.2 and v / o >= thr:
            regs.append((v / o, name, v, o))
    print(f"\nregressions >= {thr}x vs old ({len(regs)}):")
    for ratio, name, v, o in sorted(regs, reverse=True):
        ii = iso.get(name, {})
        extra = f" isolated_min={ii.get('min_sec')}" if ii else ""
        print(f"  {name}: {o} -> {v} ({ratio:.2f}x){extra}")
    imps = [(o / v, name, v, o) for name, v in nq.items()
            for o in [oq.get(name)] if o and v > 0.2 and o / v >= thr]
    print(f"\nimprovements >= {thr}x ({len(imps)}):")
    for ratio, name, v, o in sorted(imps, reverse=True)[:15]:
        print(f"  {name}: {o} -> {v} ({ratio:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
