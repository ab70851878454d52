#!/usr/bin/env python3
"""Compare two `graft.Bench` outputs per query and flag regressions.
Accepts raw Bench output (the JSON line, possibly amid sbt noise) or a
driver BENCH_r{N}.json whose "tail" still contains the full line — the
driver truncates tails, so old round files may only keep a fragment and
fail to parse; capture local baselines with
`SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench" | grep -o '{"metric".*' > bench.json`.

Usage: bench_diff.py <old.json> <new.json> [threshold_ratio=2.0]

Exits non-zero when any overlapping query regressed past the threshold,
so it works as a gate after a bench run (see README "Bench-regression
tripwire"). Bench numbers swing 2-3x with machine load (see
.claude/skills/verify): treat flags as "profile this isolated on the
same machine", not as proof — the gate is a tripwire, not a verdict.

NEW queries (no previous-round counterpart) get an ABSOLUTE tripwire
(r10 verdict #2: d15 shipped at 90.8 s unflagged because only shared
queries were compared): a new query exceeding NEW_ABS_BUDGET seconds
or 3x its prefix-family median (family = the letter prefix of the
query id, medians taken over the queries both rounds share) is flagged
and exits non-zero — it needs an isolated re-measure + plan audit in
BENCH_AB_r{N}.md before the closing snapshot commits.
"""
import json, statistics, sys

NEW_ABS_BUDGET = 10.0  # seconds at sf0.1
NEW_FAMILY_RATIO = 3.0


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "queries" in d:
            return d
        raw = d.get("tail", "") if isinstance(d, dict) else ""
    except json.JSONDecodeError:
        pass
    # raw_decode stops at the object's real end, so same-line trailing
    # noise can't break the parse; remember the last failure (e.g. a
    # driver-truncated tail) so the error message stays diagnostic
    last_err = None
    for line in raw.splitlines():
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            obj, _ = json.JSONDecoder().raw_decode(line[i:])
            return obj
        except json.JSONDecodeError as e:
            last_err = e
    detail = f" (last candidate failed: {last_err})" if last_err else ""
    raise SystemExit(f"{path}: no parseable bench JSON line found{detail}")


old, new = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
oq, nq = old.get("queries", {}), new.get("queries", {})
flags = []
added, gone = sorted(nq.keys() - oq.keys()), sorted(oq.keys() - nq.keys())
for name in sorted(oq.keys() & nq.keys()):
    a, b = oq[name], nq[name]
    if a > 0 and b / a >= thr and b > 0.5:  # ignore sub-500ms noise
        flags.append((b / a, name, a, b))
for r, name, a, b in sorted(flags, reverse=True):
    print(f"  {r:5.1f}x  {name}: {a:.2f}s -> {b:.2f}s")


def family(name):
    return name.split("_", 1)[0].rstrip("0123456789")


fam_med = {}
shared = sorted(oq.keys() & nq.keys())
for f in {family(n) for n in shared}:
    fam_med[f] = statistics.median(nq[n] for n in shared if family(n) == f)
new_flags = []
for name in added:
    b, f = nq[name], family(name)
    med = fam_med.get(f)
    over_abs = b > NEW_ABS_BUDGET
    over_fam = med is not None and med > 0 and b / med >= NEW_FAMILY_RATIO \
        and b > 0.5  # same sub-500ms noise floor as the shared gate
    if over_abs or over_fam:
        why = []
        if over_abs:
            why.append(f"> {NEW_ABS_BUDGET:.0f}s budget")
        if over_fam:
            why.append(f"{b / med:.1f}x family '{f}' median {med:.2f}s")
        new_flags.append((b, name, "; ".join(why)))
for b, name, why in sorted(new_flags, reverse=True):
    print(f"  NEW   {name}: {b:.2f}s ({why}) — isolated plan audit "
          f"required in BENCH_AB before round close")
print(f"total: {old.get('value', '?')} -> {new.get('value', '?')} sec; "
      f"{len(flags)} flagged >= {thr}x; {len(new_flags)} new-query flags; "
      f"new: {', '.join(added) or '-'}; "
      f"removed: {', '.join(gone) or '-'}")
sys.exit(1 if flags or new_flags else 0)
