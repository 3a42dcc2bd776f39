#!/usr/bin/env python3
"""Compare two graft.Bench runs for regression (drift-hardening
acceptance + the per-round comparison tool, VERDICT r10 item 1).

Methodology (validated on two same-tree runs, round 11):
- per-query statistic: MIN of the interleaved reps (noise-robust;
  reps are round-robin so a slow ambient stretch cannot poison all of
  one query's reps);
- cross-run normalization: the median of PER-SHAPE calibration ratios
  (r14: three probe shapes — shuffle+agg, distinct, window — run once
  per cycle; one shape JIT-swinging cannot move the unit), falling back
  to the single agg probe's median against pre-r14 records — cancels
  uniform ambient speed differences between runs/machines;
- gate: >= 95% of rows inside [0.67, 1.5] in calibration units.
  Measured same-tree A/B: 98% inside [0.67,1.5], 89% inside
  [0.77,1.3], 51% inside [0.9,1.1] — whole query families shift
  together across JVM runs (JIT tier state), so a tighter per-row band
  is not reachable at 3 reps on this machine; a row OUTSIDE 1.5x is
  therefore a real signal, not noise. Totals agree much tighter
  (same-tree A/B raw 4.2%).

Usage: python3 scripts/bench_ab.py A.json B.json [lo hi]
"""
import json, sys
from statistics import median

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
lo, hi = (float(sys.argv[3]), float(sys.argv[4])) if len(sys.argv) > 4 else (0.67, 1.5)

bad = False
for name, run in (("A", a), ("B", b)):
    if run.get("nerrors", 0) or run.get("rc", 0):
        print(f"run {name} carries errors (nerrors={run.get('nerrors')}, "
              f"rc={run.get('rc')}): {sorted(run.get('errors', {}))[:5]} — "
              "timing comparison on an errored run is not a gate result")
        bad = True

def shape_medians(run):
    """Per-shape calibration medians (r14 format: >=3 probe shapes)."""
    probes = run.get("calibration_probes")
    if not probes:
        return None
    return {k: median(v) for k, v in probes.items() if v}


def norm(run, cal):
    runs = run.get("runs") or {q: [t] for q, t in run["queries"].items()}
    # drop every query that errored in ANY cycle (its surviving reps
    # would count as a healthy row in the band stats) plus rows with
    # empty/-1.0 marker reps
    errored = set(run.get("errors") or {})
    return {q: min(v) / cal for q, v in runs.items()
            if q not in errored and v and min(v) > 0}


# Cross-run ambient unit. Preferred (both runs carry the r14 probe
# record): the MEDIAN OF PER-SHAPE RATIOS — each probe shape's
# cross-cycle median compared across runs, then the median over shapes,
# so one shape JIT-swinging >4x within a run (the r13 failure mode that
# forced the A/B back to raw) cannot move the unit. Legacy: the single
# agg probe's median, as before.
pmA, pmB = shape_medians(a), shape_medians(b)
shared_shapes = sorted(set(pmA or {}) & set(pmB or {}))
if shared_shapes:
    amb_shape = median([pmB[k] / pmA[k] for k in shared_shapes])
    calA, calB = 1.0, amb_shape
    cal_mode = f"per-shape ({','.join(shared_shapes)})"
else:
    calA = median(a["calibration"]) if a.get("calibration") else 1.0
    calB = median(b["calibration"]) if b.get("calibration") else 1.0
    cal_mode = "legacy single-probe"
qa = norm(a, calA)
qb = norm(b, calB)
# Self-annotate ambient context (BASELINE.md round-11/12 observation:
# same-tree sessions 90 minutes apart measured calibration 1.3-1.4x
# apart; within-run cycles swung 0.20-0.79s). Two flags:
#  - cross-run ambient ratio far from 1: calibration units carry the
#    correction, but raw totals are NOT comparable — read cal units;
#  - within-run calibration spread: per-rep normalization DEFLATES raw
#    times measured in inflated cycles, so min-of-calibrated can pick
#    a fictitious fast rep — trust medians and raw mins alongside.
# a run without a calibration record (pre-r11 format) gets norm()'s
# cal=1.0 sentinel: its q-values stay RAW while the other run's are
# calibrated — the per-row ratios below would be systematically skewed
# by the calibrated run's median, with or without a warning. Refuse.
missing_cal = [n for n, run in (("A", a), ("B", b))
               if not run.get("calibration")]
if missing_cal:
    print(f"run(s) {','.join(missing_cal)} carry no calibration record "
          "(pre-r11 format) — mixed raw-vs-calibrated per-row ratios "
          "are meaningless; compare raw totals by hand instead")
    sys.exit(2)
amb = calB / calA if calA else float("inf")
if not 1 / 1.3 <= amb <= 1.3:
    print(f"AMBIENT: cross-run calibration ratio {amb:.2f} exceeds 1.3x — "
          "raw totals are not comparable; read calibration units only")
for name, run in (("A", a), ("B", b)):
    cal = run.get("calibration") or []
    if cal and max(cal) / min(cal) > 1.3:
        print(f"AMBIENT: run {name} calibration swings "
              f"{min(cal):.3f}-{max(cal):.3f}s ({max(cal)/min(cal):.1f}x) "
              "within one run — min-of-calibrated is unreliable for its "
              "rows; cross-check medians/raw mins")
common = sorted(set(qa) & set(qb))
ratios = {q: qb[q] / qa[q] for q in common if qa[q] > 0}
if not ratios:
    print("no common successful queries between the two runs "
          "(comparing a --only partial against a full run?)")
    sys.exit(2)
inside = [q for q, r in ratios.items() if lo <= r <= hi]
tight = sum(1 for r in ratios.values() if 0.9 <= r <= 1.1)
outside = sorted(((r, q) for q, r in ratios.items() if not lo <= r <= hi),
                 key=lambda t: abs(t[0] - 1), reverse=True)
pct = 100.0 * len(inside) / len(ratios)
print(f"rows: {len(ratios)}  inside [{lo},{hi}]: {len(inside)} ({pct:.1f}%)"
      f"  [tight 0.9-1.1: {100.0*tight/len(ratios):.0f}%]")
print(f"calibration [{cal_mode}]: A={calA:.4f} B={calB:.4f} "
      f"(ambient ratio {calB/calA:.3f})")
print(f"raw totals: A={a['value']:.1f}s B={b['value']:.1f}s  "
      f"calibrated: A={a.get('total_calibrated', 0):.1f} B={b.get('total_calibrated', 0):.1f}")
med = sorted(ratios.values())[len(ratios) // 2]
print(f"median per-row ratio B/A (calibration units): {med:.3f}")
for r, q in outside[:15]:
    print(f"  OUT {q}: {qa[q]:.3f} -> {qb[q]:.3f} cal-units  ({r:.2f}x)")
sys.exit(0 if pct >= 95.0 and not bad else 1)
