#!/usr/bin/env python3
"""Print a named cell's value across stored sweeps + the pinned prior.

The borderline-adjudication helper VERDICT r18 asked for: when a watch
cell's fresh idle min lands just above 1.1x of the prior, the call
("contention vs drift vs historical-lucky-min prior") was previously
made by hand across /tmp/sweep*.json — r18's rel_merge_upsert argument
("the new min beats all six stored idle sweeps; the 0.276 prior is a
lucky min") required grepping every stored artifact. This makes that
mechanical:

    python3 tools/sweep_history.py CELL [CELL...]
        [--sweeps GLOB ...] [--prior FILE] [--git REV]
        [--max-load 1.0]

For each cell it prints the pinned prior, then one row per sweep
artifact (value, ratio vs prior, load_avg, boot_id, and whether the
sweep is same-boot as the current kernel), then the min over the IDLE
(load_avg <= --max-load) same-boot sweeps and its ratio — the number
the adjudication recipe judges against the ~1.1x line. Sweeps missing
the cell, unparseable, carrying the negative failed-query sentinel,
or lacking telemetry are listed but excluded from the min (named, not
silently dropped). Exit code is 0 whenever the inputs parse; the tool
REPORTS history, the human (and the gated re-pin tool) still make the
call.
"""
import argparse
import glob
import json
import os
import subprocess
import sys


def read_prior(path, rev):
    if rev:
        # `git show REV:path` resolves a bare path against the REPO
        # ROOT, so an absolute --prior (or the default relative path
        # run from a subdirectory) fails with git's misleading
        # "exists on disk, but not in HEAD". A ./- or ../-prefixed
        # pathspec resolves against the cwd instead — which is what
        # the caller's path actually means — so normalize to that.
        rel = os.path.relpath(path)
        spec = rel if rel.startswith("../") else f"./{rel}"
        proc = subprocess.run(["git", "show", f"{rev}:{spec}"],
                              capture_output=True, text=True)
        if proc.returncode != 0:
            raise SystemExit(f"{rev}:{spec}: git show failed: "
                             f"{proc.stderr.strip()}")
        raw, name = proc.stdout, f"{rev}:{rel}"
    else:
        try:
            with open(path) as f:
                raw, name = f.read(), path
        except OSError as e:
            raise SystemExit(f"{path}: {e}")
    try:
        doc = json.loads(raw)
    except ValueError as e:
        raise SystemExit(f"{name}: prior is not valid JSON: {e}")
    if not isinstance(doc, dict):
        raise SystemExit(f"{name}: prior is not a JSON object")
    return doc, name


def current_boot_id():
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            return f.read().strip()
    except OSError:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cells", nargs="+", metavar="CELL")
    ap.add_argument("--sweeps", action="append", metavar="GLOB",
                    help="sweep artifact glob(s); default /tmp/sweep*.json")
    ap.add_argument("--prior", default="BENCH_LOCAL.json")
    ap.add_argument("--git", metavar="REV",
                    help="read the prior from git at REV instead of the "
                         "working tree (the committed prior is the one "
                         "adjudication judges against; the working-tree "
                         "copy is overwritten by every live run)")
    ap.add_argument("--max-load", type=float, default=1.0,
                    help="sweeps above this load_avg are listed but "
                         "excluded from the idle min (default 1.0)")
    args = ap.parse_args()

    prior_doc, prior_name = read_prior(args.prior, args.git)
    prior_q = prior_doc.get("queries") or {}
    boot_now = current_boot_id()

    paths = sorted({p for g in (args.sweeps or ["/tmp/sweep*.json"])
                    for p in glob.glob(g)})
    if not paths:
        print("no sweep artifacts matched", file=sys.stderr)

    if boot_now is None:
        print("warning: current boot_id unreadable — same-boot cannot "
              "be established, so ALL sweeps are excluded from the min "
              "(labeled boot-unknown, not OTHER-BOOT)", file=sys.stderr)

    sweeps = []
    for p in paths:
        try:
            with open(p) as f:
                doc = json.load(f)
            if not isinstance(doc, dict):
                doc = {"_err": "not a JSON object"}
        except (OSError, ValueError) as e:
            doc = {"_err": str(e)}
        sweeps.append((p, doc))

    for cell in args.cells:
        prior_v = prior_q.get(cell)
        print(f"== {cell}")
        if isinstance(prior_v, (int, float)):
            print(f"  prior   {prior_v:8.4f}s           ({prior_name})")
        else:
            print(f"  prior   MISSING from {prior_name}")
        idle_vals = []
        for p, doc in sweeps:
            if "_err" in doc:
                print(f"  sweep   unreadable ({doc['_err']})  {p}")
                continue
            v = (doc.get("queries") or {}).get(cell)
            load = doc.get("load_avg")
            boot = doc.get("boot_id")
            same = (("same-boot" if boot == boot_now else "OTHER-BOOT")
                    if boot_now and boot
                    else "no-boot-id" if not boot else "boot-unknown")
            if not isinstance(v, (int, float)):
                print(f"  sweep   cell absent              {p}")
                continue
            if v < 0:
                # the failed-query sentinel (-1): repin drops it for
                # the same reason — it is not a measurement
                print(f"  sweep   {v:8.4f}s  FAILED-SENTINEL  "
                      f"{same:10s}  EXCLUDED  {p}")
                continue
            ratio = (f"{v / prior_v:5.2f}x"
                     if isinstance(prior_v, (int, float)) and prior_v > 0
                     else "   —  ")
            idle = (isinstance(load, (int, float)) and 0 <= load
                    <= args.max_load and same == "same-boot")
            if idle:
                idle_vals.append(v)
            tag = "idle" if idle else "EXCLUDED"
            # load may be any JSON value in a malformed sweep; a
            # non-scalar inside the format spec raises TypeError, so
            # render it defensively (non-numeric is already excluded
            # from the min by the isinstance check above)
            loads = (f"{load:>5}" if isinstance(load, (int, float))
                     else f"{'?':>5}")
            print(f"  sweep   {v:8.4f}s  {ratio}  load={loads}  {same:10s}"
                  f"  {tag:8s}  {p}")
        if idle_vals:
            m = min(idle_vals)
            ratio = (f" = {m / prior_v:.2f}x of prior"
                     if isinstance(prior_v, (int, float)) and prior_v > 0
                     else " (no prior to ratio against)")
            print(f"  min(idle same-boot) {m:8.4f}s{ratio} "
                  f"over {len(idle_vals)} sweep(s)")
        else:
            print("  min(idle same-boot) — none eligible")
        print()


if __name__ == "__main__":
    main()
