#!/usr/bin/env python3
"""Assert a committed bench prior's own telemetry is clean.

The contaminated-prior failure mode fired at two round boundaries
running: the driver's own live sweep (load_avg 4-7, every cell inflated
by host contention) ended up as the committed BENCH_LOCAL.json, and the
NEXT round's storm escape then compared fresh timings against poisoned
priors. tools/repin_bench_local.py now refuses to PIN such a sweep;
this tool makes the committed state itself machine-checkable, so the
mistake is caught by `sbt test` (PriorHygieneSpec) instead of by a
human reading load_avg.

    python3 tools/check_prior.py [FILE] [--git REV] [--max-load 1.0]

Default FILE is BENCH_LOCAL.json. With --git REV the blob is read from
git (`git show REV:FILE`) instead of the working tree — the right lens
for CI: Bench legitimately overwrites the working-tree copy on every
live run; only a COMMITTED contaminated prior is the mistake.

Checks (exit 1 with a reason on the first failure):
  - the file parses as JSON with a non-empty "queries" map
  - load_avg is present, non-negative (a -1 sentinel means the load
    was never measured — unknown contamination must not pass as
    verified-idle), and <= --max-load (a prior pinned before the
    telemetry fields existed fails here: re-pin it from a live sweep)
  - every query value is a finite number (the -1.0 failed-query
    sentinel must never be PINNED: a prior of -1 permanently de-arms
    that cell's storm escape)
"""
import argparse
import json
import math
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file", nargs="?", default="BENCH_LOCAL.json")
    ap.add_argument("--git", metavar="REV",
                    help="read the blob from git at REV (e.g. HEAD) "
                         "instead of the working tree")
    ap.add_argument("--max-load", type=float, default=1.0,
                    help="fail if the prior's own load_avg exceeds this "
                         "(default 1.0)")
    args = ap.parse_args()

    where = f"{args.git}:{args.file}" if args.git else args.file
    if args.git:
        proc = subprocess.run(["git", "show", f"{args.git}:{args.file}"],
                              capture_output=True, text=True)
        if proc.returncode != 0:
            raise SystemExit(f"{where}: git show failed: "
                             f"{proc.stderr.strip()}")
        text = proc.stdout
    else:
        try:
            with open(args.file) as f:
                text = f.read()
        except OSError as e:
            raise SystemExit(f"{where}: {e}")

    try:
        doc = json.loads(text)
    except ValueError as e:
        raise SystemExit(f"{where}: not valid JSON ({e}) — the prior "
                         "loader is format-tolerant but a committed "
                         "artifact must strict-parse")

    queries = doc.get("queries")
    if not isinstance(queries, dict) or not queries:
        raise SystemExit(f"{where}: no non-empty 'queries' map — a prior "
                         "like this silently de-arms the storm escape "
                         "(the r12 failure)")

    bad = {k: v for k, v in queries.items()
           if not isinstance(v, (int, float)) or not math.isfinite(v)
           or v < 0}
    if bad:
        raise SystemExit(f"{where}: non-finite/negative pinned values "
                         f"{bad} — the -1.0 failed-query sentinel must "
                         "not be pinned as a prior")

    la = doc.get("load_avg")
    if la is None:
        raise SystemExit(f"{where}: no load_avg telemetry — re-pin from "
                         "a live sweep so contamination is checkable")
    if float(la) < 0:
        # getSystemLoadAverage returns -1 when unavailable, and an old
        # repin fabricated -1.0 for telemetry-less sources — either way
        # a negative value means the load was NOT measured, and an
        # unknown-contamination prior must not read as verified-idle
        # (ADVICE r15)
        raise SystemExit(f"{where}: load_avg {float(la)} is negative — a "
                         "sentinel, not a measurement; the prior's "
                         "contamination state is UNKNOWN. Re-pin from a "
                         "live sweep whose telemetry is real.")
    if float(la) > args.max_load:
        raise SystemExit(
            f"{where}: load_avg {float(la):.2f} > {args.max_load} — the "
            "committed prior is a CONTENDED-host sweep (the r13/r14 "
            "boundary failure). Restore the last clean prior "
            "(git log -- BENCH_LOCAL.json; pick the one whose load_avg "
            "is < 1) or re-pin from two idle same-boot sweeps via "
            "tools/repin_bench_local.py.")

    print(f"{where}: clean prior — {len(queries)} queries, "
          f"load_avg {float(la):.2f} <= {args.max_load}")


if __name__ == "__main__":
    sys.exit(main())
