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

Noise normalization (round 17, completed round 18): graft.Bench runs
TWO fixed-cost reference legs through the same interleaved passes —
`zz_ref_fixed` (CPU-bound: constant local-relation aggregate) and
`zz_ref_scan` (IO-bound: fixed full-column parquet scan + one wide
shuffle). Neither touches a graft operator, so each leg's cross-round
ratio measures one MODE of host noise and nothing else. The r17
close-out showed why one reference is not enough: the CPU leg held
0.98x while every shuffle-heavy leg inflated ~1.1x — a single
CPU-shaped normalizer is blind to the IO mode. For every common leg
both normalized ratios are reported, and the flag gate divides by the
GEOMETRIC MEAN of the clamped factors: per-leg profile labels don't
exist, and the two one-sided alternatives are both worse — dividing
by the max (most forgiving) lets noise on the MISMATCHED reference
excuse a real regression in a leg that never felt that noise (up to
the full 1.25x clamp), while dividing by the min false-flags genuine
noise-mode legs. The geometric mean bounds mismatched-mode masking at
sqrt(clamp) ≈ 1.12x, forgives uniform noise fully, and the per-ref
columns are printed precisely so a flagged (or suspiciously calm) leg
can be read against the reference that matches its profile by hand.
Each factor is clamped to [0.8, 1.25] first, so the gate can never
excuse more than 1.25x however the references move.
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

    # host-noise factors from the fixed-cost reference legs, when both
    # sides carry them; the reference legs themselves are excluded from
    # the flag gate (their movement IS the noise being normalized out)
    REFS = ("zz_ref_fixed", "zz_ref_scan")  # CPU-shaped, IO-shaped
    noises = {}   # ref name -> (raw, clamped)
    for ref in REFS:
        if ref in prev and ref in cur and prev[ref][0] > 0:
            raw = cur[ref][0] / prev[ref][0]
            # clamp to the documented ambient-noise band: the reference
            # legs are the SHORTEST in the suite, so a transient landing
            # on their own reps must not rescale every other leg past
            # the flag gate (a 1.6x ref ratio dividing a real 1.5x
            # regression down to 0.94 would pass it silently)
            noises[ref] = (raw, min(max(raw, 0.8), 1.25))
    # the gate divides by the geometric mean of the clamped factors
    # (see module docstring: max-forgiveness masks real regressions
    # behind the mismatched reference's noise, min false-flags genuine
    # noise-mode legs; the mean bounds masking at sqrt(clamp))
    gate_noise = None
    if noises:
        prod = 1.0
        for _, c in noises.values():
            prod *= c
        gate_noise = prod ** (1.0 / len(noises))

    rows = []
    for n in common:
        pm, cm = prev[n][0], cur[n][0]
        ratio = cm / pm if pm > 0 else float("inf")
        norms = {ref: ratio / c for ref, (_, c) in noises.items()}
        gate = ratio / gate_noise if gate_noise else ratio
        rows.append((gate, ratio, n, pm, cm, cur[n][1], norms))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] > flag and r[2] not in REFS]
    noise_note = "   ".join(
        f"noise({ref}): {raw:.3f}x (clamped {c:.3f}x)"
        for ref, (raw, c) in noises.items())
    print(f"common legs: {len(common)}   added: {len(added)}   "
          f"removed: {len(removed)}   flag threshold: {flag}x"
          + (f"   {noise_note} -> flags use the geomean-normalized ratio "
             f"(gate /= {gate_noise:.3f})"
             if noises else ""))
    psum = sum(r[3] for r in rows)
    csum = sum(r[4] for r in rows)
    if psum:
        line = (f"common-set median sum: {psum:.1f}s -> {csum:.1f}s "
                f"({csum / psum:.2f}x)")
        if gate_noise:
            line += f"   normalized: {csum / psum / gate_noise:.2f}x"
        print(line)
    else:
        print("no common legs")
    for side, tot in (("prev", ptot), ("cur", ctot)):
        if tot:
            bits = "  ".join(f"{k}={v}" for k, v in sorted(tot.items()))
            print(f"{side}: {bits}")
    print()
    norm_hdr = "".join(f"{'n_' + ref[7:]:>7}  " for ref in REFS
                       if ref in noises)
    print(f"{norm_hdr}{'ratio':>7}  {'prev_med':>9}  {'cur_med':>9}"
          "  leg (worst first)")
    for gate, ratio, n, pm, cm, vec, norms in rows[:25]:
        mark = "  <-- FLAG" if (gate > flag and n not in REFS) else ""
        norm_col = "".join(f"{norms[ref]:7.2f}  " for ref in REFS
                           if ref in norms)
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
