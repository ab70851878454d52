#!/usr/bin/env python3
"""Compare two `graft.Bench` outputs per query and flag regressions.
Accepts raw Bench output (the JSON line, possibly amid sbt noise) or a
driver BENCH_r{N}.json whose "tail" still contains the full line — the
driver truncates tails, so old round files may only keep a fragment and
fail to parse; capture local baselines with
`SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench" | grep -o '{"metric".*' > bench.json`.

Usage: bench_diff.py <old.json> <new.json> [threshold_ratio=2.0]
       [--isolate <sfDir>]

Exits non-zero when any overlapping query regressed past the threshold,
so it works as a gate after a bench run (see README "Bench-regression
tripwire"). Bench numbers swing 2-3x with machine load (see
.claude/skills/verify) — which is why, with `--isolate <sfDir>`, every
flag is AUTOMATICALLY re-measured isolated: the flagged queries re-run
through `graft.Bench` in a FRESH JVM (SPARK_GRAFT_ONLY restricts it),
and the gate prints `flagged -> isolated` pairs. A flag whose isolated
time clears the same threshold is adjudicated machine drift and no
longer fails the gate (every r12 flag was hand-adjudicated exactly this
way — s11, d20/d21/d22, e27, c27; this encodes it). Without --isolate
the old treat-as-tripwire semantics hold.

NEW queries (no previous-round counterpart) get an ABSOLUTE tripwire
(r10 verdict #2: d15 shipped at 90.8 s unflagged because only shared
queries were compared): a new query exceeding NEW_ABS_BUDGET seconds
or 3x its prefix-family median (family = the letter prefix of the
query id, medians taken over the queries both rounds share) is flagged
— isolated re-measure applies to these too; one that clears both its
triggers isolated is adjudicated, the rest need a plan audit in
BENCH_AB_r{N}.md before the closing snapshot commits.
"""
import json, os, re, statistics, subprocess, sys

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


def parse_bench_stdout(text):
    for line in text.splitlines():
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            obj, _ = json.JSONDecoder().raw_decode(line[i:])
            return obj.get("queries", {})
        except json.JSONDecodeError:
            continue
    return None


def isolated_rerun(sf_dir, names):
    """Re-run exactly `names` through graft.Bench in a fresh JVM and
    return {name: seconds} (None on launch/parse failure — the caller
    keeps the un-adjudicated flags)."""
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(sorted(names)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            env=env, cwd=repo, capture_output=True, text=True,
            timeout=3600)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"  isolate: re-run failed to launch ({e}); flags stand")
        return None
    q = parse_bench_stdout(out.stdout + "\n" + out.stderr)
    if q is None:
        print("  isolate: no bench JSON in re-run output; flags stand")
    return q


args = [a for a in sys.argv[1:] if a != "--isolate"]
iso_dir = None
if "--isolate" in sys.argv:
    i = sys.argv.index("--isolate")
    if i + 1 >= len(sys.argv):
        raise SystemExit("--isolate needs an <sfDir> argument")
    iso_dir = sys.argv[i + 1]
    args = sys.argv[1:i] + sys.argv[i + 2:]
old, new = load(args[0]), load(args[1])
thr = float(args[2]) if len(args) > 2 else 2.0
oq, nq = old.get("queries", {}), new.get("queries", {})


def rows_of(d):
    """Absolute observed output rows per query. Newer Bench emits `rows`
    directly; older files carry only rows_per_sec, from which rows
    reconstruct as rate*seconds — but the emitted rate was rounded to
    integer, so SMALL counts reconstruct garbage (rows=1 at 0.5s emits
    rate 2, reconstructing to whatever the new wall is). Reconstructed
    values below 1000 are dropped rather than risk a false
    "work changed" verdict."""
    if "rows" in d:
        return {k: float(v) for k, v in d["rows"].items()}
    out = {}
    for k, rate in d.get("rows_per_sec", {}).items():
        sec = d.get("queries", {}).get(k)
        if sec and sec > 0 and float(rate) * sec >= 1000:
            out[k] = float(rate) * sec
    return out


def rows_equal(a, b):
    return abs(a - b) <= 0.01 * max(a, b, 1.0)


orows, nrows = rows_of(old), rows_of(new)
flags = []
added, gone = sorted(nq.keys() - oq.keys()), sorted(oq.keys() - nq.keys())
for name in sorted(oq.keys() & nq.keys()):
    a, b = oq[name], nq[name]
    if a > 0 and b / a >= thr and b > 0.5:  # ignore sub-500ms noise
        flags.append((b / a, name, a, b))
for r, name, a, b in sorted(flags, reverse=True):
    # streaming drains are trigger-overhead-dominated: wall is the wrong
    # lone metric (round-14 watch item). When both rounds observed the
    # query's output rows, classify the flag: identical rows mean the
    # work done is identical (drift candidate — isolation still applies);
    # changed rows mean the query computed something different.
    note = ""
    if name in orows and name in nrows:
        if rows_equal(orows[name], nrows[name]):
            note = (f"  [same output rows ({nrows[name]:.0f}) — "
                    "drift candidate]") if name.startswith("e") else \
                   f"  [same output rows ({nrows[name]:.0f})]"
        else:
            note = (f"  [output rows {orows[name]:.0f} -> {nrows[name]:.0f}"
                    " — work changed, audit the query/fixture]")
    print(f"  {r:5.1f}x  {name}: {a:.2f}s -> {b:.2f}s{note}")


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

# --isolate: machine-check every flag in a fresh JVM; flags whose
# isolated time clears the same trigger are adjudicated drift. Every
# adjudication is also emitted as a markdown row meant to be pasted
# VERBATIM into BENCH_AB_r{N}.md, so the round record keeps the
# evidence (an exit-0 adjudication with no persisted trail would let a
# bimodal/warm-cache regression silently pass the gate).
adjudications = []  # (name, old, shared-run, isolated, verdict)
if iso_dir and (flags or new_flags):
    names = [n for _, n, _, _ in flags] + [n for _, n, _ in new_flags]
    print(f"  isolate: re-running {len(names)} flagged queries fresh "
          f"({iso_dir}) ...")
    iso = isolated_rerun(iso_dir, names)
    if iso is not None:
        kept = []
        for r, name, a, b in flags:
            it = iso.get(name)
            if it is None:
                kept.append((r, name, a, b))
                adjudications.append((name, a, b, None, "flag stands (missing from re-run)"))
                print(f"  flagged -> isolated  {name}: {b:.2f}s -> "
                      f"(missing from re-run); flag stands")
            elif a > 0 and it / a >= thr and it > 0.5:
                kept.append((it / a, name, a, it))
                adjudications.append((name, a, b, it, f"flag STANDS ({it / a:.1f}x isolated)"))
                print(f"  flagged -> isolated  {name}: {b:.2f}s -> "
                      f"{it:.2f}s — STILL {it / a:.1f}x; flag stands")
            else:
                adjudications.append((name, a, b, it, f"adjudicated drift (clears {thr:.1f}x isolated)"))
                print(f"  flagged -> isolated  {name}: {b:.2f}s -> "
                      f"{it:.2f}s — clears {thr:.1f}x; adjudicated drift")
        flags = kept
        kept_new = []
        for b, name, why in new_flags:
            it = iso.get(name)
            f = family(name)
            med = fam_med.get(f)
            still_abs = it is None or it > NEW_ABS_BUDGET
            still_fam = it is not None and med is not None and med > 0 \
                and it / med >= NEW_FAMILY_RATIO and it > 0.5
            if still_abs or still_fam:
                kept_new.append((b if it is None else it, name, why))
                shown = "missing" if it is None else f"{it:.2f}s"
                adjudications.append((name, None, b, it, f"NEW-query flag stands ({why})"))
                print(f"  flagged -> isolated  NEW {name}: {b:.2f}s -> "
                      f"{shown}; flag stands")
            else:
                adjudications.append((name, None, b, it, "NEW-query adjudicated (clears budget+family isolated)"))
                print(f"  flagged -> isolated  NEW {name}: {b:.2f}s -> "
                      f"{it:.2f}s — clears budget+family; adjudicated")
        new_flags = kept_new

if adjudications:
    print("\n  paste into BENCH_AB_r{N}.md:")
    print("  | query | r{N-1} | r{N} shared run | isolated fresh-JVM | verdict |")
    print("  |---|---|---|---|---|")
    for name, a, b, it, verdict in adjudications:
        olds = "new" if a is None else f"{a:.2f}s"
        isos = "missing" if it is None else f"{it:.2f}s"
        print(f"  | {name} | {olds} | {b:.2f}s | {isos} | {verdict} |")
    print("  (single clearing re-run — for sub-3s queries corroborate "
          "with `graft.Profile <q> <dir> 3` warm repeats)\n")

print(f"total: {old.get('value', '?')} -> {new.get('value', '?')} sec; "
      f"{len(flags)} flagged >= {thr}x; {len(new_flags)} new-query flags; "
      f"new: {', '.join(added) or '-'}; "
      f"removed: {', '.join(gone) or '-'}")
sys.exit(1 if flags or new_flags else 0)
