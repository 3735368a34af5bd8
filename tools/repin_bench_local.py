#!/usr/bin/env python3
"""THE canonical writer for re-pinning BENCH_LOCAL.json priors.

Bench.scala's emit() is the primary writer of BENCH_LOCAL.json; any
HAND re-pin (restoring a clean sweep, merging cells) must go through
this tool rather than ad-hoc json.dumps. Rationale (VERDICT r12 task
1c): the r12 re-pin commits wrote Python-default separators
('"queries": {'), the then-exact-format prior loader in Bench matched
only its own compact style ('"queries":{'), and the adaptive
storm-escape silently ran the whole driver sweep with ZERO priors —
16 un-escaped deopt-storm cells shipped. The loader is now
whitespace-tolerant (graft.BenchPriors, unit-tested against the
committed file), and this tool closes the other half: one writer, one
format, byte-compatible with Bench's own emit().

    python3 tools/repin_bench_local.py SOURCE.json [-o BENCH_LOCAL.json]
        [--drop-storm-ratio]

SOURCE.json is any bench artifact carrying a top-level "queries" map
(a BENCH_LOCAL.json from any round/format, or a driver BENCH_r{N}.json
whose "parsed" field holds one). Values are re-rounded to Bench's 4dp
(3dp for storm_ratio). --drop-storm-ratio empties the storm_ratio map:
use it when re-pinning values NOT produced against the current
committed prior — a hand-carried ratio map breaks the documented
achieved-min/prior semantics (ADVICE r12 medium).

The output is verified by re-parsing with the same scoped-scan rules
graft.BenchPriors implements (opener + first '}') before the file is
replaced, so this tool can never write priors Bench cannot read.
"""
import argparse
import json
import re
import sys


def bench_fmt(v, dp):
    """Bench's BigDecimal.setScale(dp, HALF_UP).toString equivalent."""
    q = round(float(v) + 0.0, dp)
    s = f"{q:.{dp}f}"
    # BigDecimal prints trailing zeros at the set scale; keep them for
    # byte-parity with emit()
    return s


def load_source(path):
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc.get("queries"), dict):
        return doc
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed
    raise SystemExit(f"{path}: no 'queries' map found")


def reparse_like_bench(line):
    """The same scoped scan graft.BenchPriors.parse implements."""
    m = re.search(r'"queries"\s*:\s*\{', line)
    if not m:
        return {}
    close = line.find("}", m.end())
    if close < 0:
        return {}
    return {k: float(v) for k, v in
            re.findall(r'"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9][0-9.]*)',
                       line[m.end():close])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("-o", "--out", default="BENCH_LOCAL.json")
    ap.add_argument("--drop-storm-ratio", action="store_true",
                    help="empty the storm_ratio map (use when the values "
                         "were not measured against the current prior)")
    args = ap.parse_args()

    src = load_source(args.source)
    queries = {k: v for k, v in src["queries"].items()}
    storm = {} if args.drop_storm_ratio else src.get("storm_ratio", {}) or {}
    total = sum(v for v in queries.values() if v >= 0)

    qs = ",".join(f'"{k}":{bench_fmt(v, 4)}' for k, v in queries.items())
    sr = ",".join(f'"{k}":{bench_fmt(v, 3)}' for k, v in storm.items())
    sf = src.get("sf", "/root/testdata/sf0.1")
    line = (f'{{"metric":"total","value":{bench_fmt(total, 4)},'
            f'"unit":"sec","queries":{{{qs}}},"storm_ratio":{{{sr}}},'
            f'"sf":"{sf}"}}')

    # refuse to write anything the loader cannot read back
    back = reparse_like_bench(line)
    if len(back) != len(queries):
        raise SystemExit(f"self-check failed: wrote {len(queries)} queries, "
                         f"re-parsed {len(back)}")
    json.loads(line)  # and it must be real JSON

    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(f"{args.out}: {len(queries)} queries, total {bench_fmt(total, 4)} s, "
          f"storm_ratio {'dropped' if args.drop_storm_ratio else f'{len(storm)} entries'}")


if __name__ == "__main__":
    sys.exit(main())
