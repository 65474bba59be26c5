#!/usr/bin/env python3
"""Build/refresh the committed bench_baseline.json regression envelope.

Usage: python3 tools/bench_baseline.py target/bench.json [more bench.json...]

The envelope Bench.scala's tripwire compares against is the per-query MAX
of per-sweep MINIMA over every record given (plus the existing envelope,
if present) — NOT a single sweep's minima: artifact-reading queries swing
up to ~3x between warm sweeps on parquet-read scheduling alone (the
documented +-1 s noise), so a raw-min baseline would false-flag. Feed it
at least two artifact-warm sweeps before committing.

Since r16 the PHASES get the same envelope (section "phases"): the per-
phase MIN (first pass vs optional re-measure; older records carry only
"wall") maxed over sweeps. Queries/phases present in the old envelope but
absent from every input are DROPPED (renamed/removed entries must not
leave stale tripwires).
"""
import json
import sys

OUT = "bench_baseline.json"


def main(paths):
    if not paths:
        sys.exit(__doc__)
    env = {}
    ph_env = {}
    sweeps = 0
    try:
        with open(OUT) as f:
            prev = json.load(f)
        env = {k: v["min"] for k, v in prev.get("queries", {}).items()}
        ph_env = {k: v["min"] for k, v in prev.get("phases", {}).items()}
        sweeps = prev.get("sweeps", 1)
    except FileNotFoundError:
        pass
    seen = set()
    ph_seen = set()
    erred = set()
    for p in paths:
        with open(p) as f:
            rec = json.load(f)
        sweeps += 1
        for name, q in rec["queries"].items():
            if q.get("err") is not None:
                erred.add(name)
                continue
            seen.add(name)
            env[name] = max(env.get(name, 0.0), q["min"])
        for name, ph in rec.get("phases", {}).items():
            # a phase erred only if NO sample succeeded: the merged record
            # keeps the first sample's "err" beside a valid re-measured
            # min ("wall2" without "err2"), which must still feed the
            # envelope (r16 review)
            retried_ok = "wall2" in ph and "err2" not in ph
            if ph.get("err") is not None and not retried_ok:
                erred.add(name)
                continue
            wall = ph.get("min", ph.get("wall"))
            if wall is None:
                continue
            ph_seen.add(name)
            ph_env[name] = max(ph_env.get(name, 0.0), wall)
    dropped = sorted(set(env) - seen) + sorted(set(ph_env) - ph_seen)
    env = {k: v for k, v in env.items() if k in seen}
    ph_env = {k: v for k, v in ph_env.items() if k in ph_seen}
    # never silently lose a tripwire: a query that errored in EVERY input
    # sweep (vs one that was renamed away) is a regression in itself, and
    # its envelope entry disappearing means the post-fix merge would seed
    # from post-fix timings only (r13 review)
    for name in dropped:
        kind = "ERRORED in all inputs" if name in erred else "absent"
        print(f"WARNING: dropping envelope entry {name} ({kind})",
              file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(
            {
                "comment": "regression envelope: max of per-sweep minima over "
                           f"{sweeps} artifact-warm sweeps (tools/bench_baseline.py); "
                           "Bench flags min > 2x envelope and > +0.25 s, for "
                           "queries AND (since r16) phases",
                "sweeps": sweeps,
                "queries": {k: {"min": round(v, 3)} for k, v in sorted(env.items())},
                "phases": {k: {"min": round(v, 3)} for k, v in sorted(ph_env.items())},
            },
            f, indent=1)
        f.write("\n")
    print(f"wrote {OUT}: {len(env)} queries, {len(ph_env)} phases, "
          f"{sweeps} sweeps merged")


if __name__ == "__main__":
    main(sys.argv[1:])
