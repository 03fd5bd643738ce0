#!/usr/bin/env python3
"""Regression net for the per-round bench artifacts.

Usage:
    python3 tools/bench_diff.py PREV CURRENT [--flag=RATIO]

PREV / CURRENT are bench artifacts in either shape:
  - a local `bench_out.json` (the full graft.Bench JSON line:
    `passes` per-pass vectors, `queries` medians, total_cold/total_warm)
  - a driver `BENCH_r{N}.json` ({"tail": "...", "parsed": {...}}) whose
    `tail` holds the (possibly truncated) raw JSON line — per-query
    vectors are recovered by regex, so a truncated head only costs the
    legs it cut off.

Prints the common-leg median ratio table (worst first), flags legs
whose median moved past --flag (default 1.5x), the added/removed leg
sets, the common-set median sums, and the cold/warm split when both
sides carry it. Exit code 1 if any common leg is flagged (so a
close-out script can fail loudly), else 0.

Noise normalization (round 17): when BOTH artifacts carry the
fixed-cost reference leg `zz_ref_fixed` (a constant local-relation
aggregate graft.Bench runs through the same interleaved passes — its
cross-round ratio measures host noise alone, since no repo change can
touch it), every common-leg ratio is ALSO reported divided by the
reference ratio, and the flag gate uses the NORMALIZED ratio. A
uniform ambient-noise window (the documented ~10% VM mode) then reads
as 1.0x machine-decidably instead of needing hand-run repeats.
"""
import json
import re
import statistics
import sys


def load_passes(path):
    """name -> (median, [passes...]) plus whatever totals are available."""
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = {}
    text = raw
    totals = {}
    if isinstance(doc, dict):
        if "tail" in doc:  # driver artifact: regex over the raw tail
            text = doc.get("tail", "")
            parsed = doc.get("parsed") or {}
            for k in ("value", "total_cold", "total_warm", "n_errors"):
                if k in parsed:
                    totals[k] = parsed[k]
        else:  # full bench_out.json
            for k in ("value", "total_cold", "total_warm"):
                if k in doc:
                    totals[k] = doc[k]
            if isinstance(doc.get("errors"), list):
                totals["n_errors"] = len(doc["errors"])
            passes = doc.get("passes")
            if isinstance(passes, dict):
                out = {n: (statistics.median(v), v)
                       for n, v in passes.items() if v}
                return out, totals
    out = {}
    # per-pass vectors: "leg":[a,b,c]
    for m in re.finditer(r'"([A-Za-z]\w+)":\[([0-9.,\s]+)\]', text):
        name, vec = m.group(1), [float(x) for x in m.group(2).split(",")]
        if vec and not name.startswith(("passes", "queries")):
            out[name] = (statistics.median(vec), vec)
    if not out:
        # medians-only fallback: "leg":0.123 inside a queries object
        qm = re.search(r'"queries":\{([^}]*)\}', text)
        if qm:
            for m in re.finditer(r'"(\w+)":([0-9.]+)', qm.group(1)):
                out[m.group(1)] = (float(m.group(2)), [float(m.group(2))])
    return out, totals


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--flag="):
            flag = float(a.split("=", 1)[1])
    if len(args) != 2:
        sys.exit(__doc__)
    prev, ptot = load_passes(args[0])
    cur, ctot = load_passes(args[1])
    common = sorted(set(prev) & set(cur))
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))

    # host-noise factor from the fixed-cost reference leg, when both
    # sides carry it; the reference leg itself is excluded from the
    # flag gate (its movement IS the noise being normalized out)
    REF = "zz_ref_fixed"
    noise = raw_noise = None
    if REF in prev and REF in cur and prev[REF][0] > 0:
        raw_noise = cur[REF][0] / prev[REF][0]
        # clamp to the documented ambient-noise band: the reference leg
        # is the SHORTEST leg in the suite, so a transient landing on
        # its own reps must not rescale every other leg past the flag
        # gate (a 1.6x ref ratio dividing a real 1.5x regression down
        # to 0.94 would pass it silently)
        noise = min(max(raw_noise, 0.8), 1.25)

    rows = []
    for n in common:
        pm, cm = prev[n][0], cur[n][0]
        ratio = cm / pm if pm > 0 else float("inf")
        norm = ratio / noise if noise else ratio
        rows.append((norm, ratio, n, pm, cm, cur[n][1]))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] > flag and r[2] != REF]
    print(f"common legs: {len(common)}   added: {len(added)}   "
          f"removed: {len(removed)}   flag threshold: {flag}x"
          + (f"   noise factor ({REF}): {raw_noise:.3f}x"
             f" (clamped {noise:.3f}x) -> flags use normalized ratios"
             if noise else ""))
    psum = sum(r[3] for r in rows)
    csum = sum(r[4] for r in rows)
    if psum:
        line = (f"common-set median sum: {psum:.1f}s -> {csum:.1f}s "
                f"({csum / psum:.2f}x)")
        if noise:
            line += f"   normalized: {csum / psum / noise:.2f}x"
        print(line)
    else:
        print("no common legs")
    for side, tot in (("prev", ptot), ("cur", ctot)):
        if tot:
            bits = "  ".join(f"{k}={v}" for k, v in sorted(tot.items()))
            print(f"{side}: {bits}")
    print()
    norm_hdr = f"{'norm':>7}  " if noise else ""
    print(f"{norm_hdr}{'ratio':>7}  {'prev_med':>9}  {'cur_med':>9}"
          "  leg (worst first)")
    for norm, ratio, n, pm, cm, vec in rows[:25]:
        mark = "  <-- FLAG" if (norm > flag and n != REF) else ""
        norm_col = f"{norm:7.2f}  " if noise else ""
        base = f"{norm_col}{ratio:7.2f}  {pm:9.3f}  {cm:9.3f}  {n}"
        print(base + (f"  passes={vec}{mark}" if mark else mark))
    if added:
        addsum = sum(cur[n][0] for n in added)
        print(f"\nadded legs ({addsum:.1f}s of median): {', '.join(added)}")
    if removed:
        print(f"removed legs: {', '.join(removed)}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
