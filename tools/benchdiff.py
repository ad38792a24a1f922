#!/usr/bin/env python3
"""Diff two bench JSONs (bench_out.json / BENCH_r{N}.json) per query.

Usage: python3 tools/benchdiff.py <old.json> <new.json> [ratio_threshold]
   or: python3 tools/benchdiff.py <new.json>

With ONE argument the old side defaults to BASELINE.md (the frozen
round-11 medians — the driver's "within 2x of BASELINE" criterion) and
the threshold defaults to 2.0, so `python3 tools/benchdiff.py
bench_out.json` IS the mechanical baseline check. BASELINE.md embeds
its machine-readable run as a single JSON line; the loader below finds
it the same way it finds the JSON line in a BENCH_r file.

Prints added/removed keys, any row-count changes (result-shape
regressions), and every query whose median moved BEYOND NOISE, sorted
by ratio. Noise handling (round 11): when either side carries a
`spread` field ([min, median, max] per line — bench_out has it since
r11), a delta only flags when the two runs' spread INTERVALS are
disjoint — overlapping spreads mean the medians' difference is within
the runs' own rep-to-rep variance (two identical-code runs have
measured 1.07-1.12x median drift). The ratio threshold (default 1.25x
either way) still applies on top. A `load` stamp on either side is
echoed so a contaminated run is visible in the diff itself.
"""
import json
import sys


def load(p):
    with open(p) as f:
        txt = f.read()
    # BENCH_r files may carry a truncated log tail before the JSON line
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    return json.loads(txt)


def main(old_p, new_p, thresh=1.25):
    old, new = load(old_p), load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    for side, d in (("old", old), ("new", new)):
        if d.get("load"):
            print(f"{side} load: {[round(x, 2) for x in d['load']]}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}):", ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}):", ", ".join(removed))

    orows, nrows = old.get("rows", {}), new.get("rows", {})
    for k in sorted(set(orows) & set(nrows)):
        if orows[k] != nrows[k]:
            print(f"ROWS CHANGED {k}: {orows[k]} -> {nrows[k]}")

    moved, within = [], 0
    for k in set(oq) & set(nq):
        if oq[k] <= 0:
            continue
        r = nq[k] / oq[k]
        if r <= thresh and r >= 1.0 / thresh:
            continue
        # spread-aware: overlapping [min, max] intervals = within the
        # runs' own variance, not a regression
        if k in osp and k in nsp:
            olo, _, ohi = osp[k]
            nlo, _, nhi = nsp[k]
            if nlo <= ohi and olo <= nhi:
                within += 1
                continue
        moved.append((r, k))
    for r, k in sorted(moved, reverse=True):
        print(f"{'SLOWER' if r > 1 else 'faster'} {k}: "
              f"{oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x)")
    if within:
        print(f"({within} past-threshold deltas suppressed: "
              "spread intervals overlap — run-to-run noise)")
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"total: {ot:.1f}s -> {nt:.1f}s ({nt / ot:.2f}x) "
              f"[{len(oq)} -> {len(nq)} keys]")


if __name__ == "__main__":
    import os
    if len(sys.argv) == 2:  # baseline mode: new run vs frozen BASELINE.md at 2x
        base = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE.md")
        main(base, sys.argv[1], 2.0)
    else:
        t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
        main(sys.argv[1], sys.argv[2], t)
