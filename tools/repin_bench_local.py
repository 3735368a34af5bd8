#!/usr/bin/env python3
"""THE canonical writer for re-pinning BENCH_LOCAL.json priors.

Since r15 Bench's live output defaults to BENCH_LIVE.json, so this
tool is the ONLY writer of the committed prior file: every re-pin
(promoting a clean live sweep, merging cells) must go through it
rather than ad-hoc json.dumps. Rationale (VERDICT r12 task
1c): the r12 re-pin commits wrote Python-default separators
('"queries": {'), the then-exact-format prior loader in Bench matched
only its own compact style ('"queries":{'), and the adaptive
storm-escape silently ran the whole driver sweep with ZERO priors —
16 un-escaped deopt-storm cells shipped. The loader is now
whitespace-tolerant (graft.BenchPriors, unit-tested against the
committed file), and this tool closes the other half: one writer, one
format, byte-compatible with Bench's own emit().

    python3 tools/repin_bench_local.py SOURCE.json [SOURCE2.json ...]
        [-o BENCH_LOCAL.json] [--keep-storm-ratio]

Each SOURCE.json is any bench artifact carrying a top-level "queries"
map (a BENCH_LOCAL.json from any round/format, or a driver
BENCH_r{N}.json whose "parsed" field holds one). With MULTIPLE
sources, cells are min-merged (the committed-prior discipline: the
per-cell min of two same-boot idle sweeps) with env telemetry taken
from the lowest-load source; the contamination guard applies to every
source, and --keep-storm-ratio is rejected (a merge is by definition
not a verbatim restore). Failed-query sentinels (negative cells) are
dropped on merge/hand re-pins — a pinned -1 would permanently de-arm
that cell's storm escape. Values are re-rounded to Bench's 4dp
(3dp for storm_ratio); the sibling_jvms/load_avg/boot_id env fields
are carried through when the source has them. The storm_ratio map is
DROPPED by default: a hand re-pin's values were not produced against
the current committed prior, so a carried ratio map breaks the
documented achieved-min/prior semantics (ADVICE r12 medium) — and
suite_median_storm, a statistic of those same dropped ratios, is
dropped with it (ADVICE r13), as are the live-run-relative
unescaped/revisit_cleared arrays and prior_* provenance fields, which
Bench regenerates live. --keep-storm-ratio is only for restoring an
unmodified live Bench artifact verbatim (it carries
suite_median_storm too).

The output is verified by re-parsing with the same scoped-scan rules
graft.BenchPriors implements (opener + first '}') before the file is
replaced, so this tool can never write priors Bench cannot read.

A source whose own telemetry reads load_avg > --max-load (default 1.0)
is REFUSED without --force: pinning a contended-host sweep poisons
every next-round storm ratio, and that mistake shipped at two round
boundaries running (r13 committed a load_avg-6.89 sweep, r14's tree
held a load_avg-4.37 one). tools/check_prior.py asserts the same
invariant over the COMMITTED file from `sbt test`.
"""
import argparse
import decimal
import json
import re
import sys


def bench_fmt(v, dp):
    """Bench's BigDecimal.setScale(dp, HALF_UP).toString equivalent.

    Must be decimal HALF_UP, not Python round() (banker's / half-EVEN at
    exact decimal ties: round(2.0625, 3) -> 2.062 where BigDecimal
    writes 2.063). Scala's BigDecimal(v) wraps java.math.BigDecimal
    .valueOf(v), i.e. the double's SHORTEST decimal rendering — which is
    exactly Python's str(float), so Decimal(str(v)) reproduces the same
    decimal before the same HALF_UP quantize."""
    q = decimal.Decimal(str(float(v))).quantize(
        decimal.Decimal(1).scaleb(-dp), rounding=decimal.ROUND_HALF_UP)
    # java BigDecimal has no negative zero: a value in (-10^-dp/2, 0)
    # quantizes to Python's Decimal("-0.0000") but Scala prints
    # "0.0000" — normalize, since the value-level self-check cannot
    # catch it (float("-0.0000") == 0.0). ADVICE r13.
    if not q:
        q = q.copy_abs()
    # BigDecimal prints trailing zeros at the set scale; keep them for
    # byte-parity with emit()
    return f"{q:.{dp}f}"


def sanitize_id(s):
    """BenchPriors.sanitizeId's filter (keep [A-Za-z0-9_-]), applied to
    externally-sourced identifier fields before interpolating them into
    the output JSON (ADVICE r15): a boot_id carrying a backslash escape
    would be silently rewritten on re-parse, and a quote would produce
    invalid JSON — Bench already sanitizes the same field on its side.
    Kernel boot UUIDs are [-0-9a-f], so real values pass unchanged."""
    return re.sub(r"[^A-Za-z0-9_-]", "", str(s))


def checked_id(s, context):
    """sanitize_id that REFUSES instead of silently rewriting (ADVICE
    r17): for storm_ratio KEYS and escape-array NAMES a silent rewrite
    can rename a cell ('foo bar' -> 'foobar'), collapse two distinct
    keys into duplicate JSON keys (json.loads keeps the last, silently),
    or emit an empty-string name — and the value-level self-check only
    covers the queries map, so none of that is caught downstream. A
    single-valued field like boot_id keeps the plain sanitize (no
    collision hazard; pinned r15 behavior). Live Bench names are
    STRICTLY [A-Za-z0-9_]+ (BenchPriors' scoped re-parse matches only
    that class), so validate against exactly that — not sanitize_id's
    wider [A-Za-z0-9_-], under which a doctored hyphenated name would
    pass here yet be invisible to every downstream re-parse (ADVICE
    r18). Non-string values (e.g. a JSON number smuggled into the
    watch array) are refused too, not str()-coerced. Real artifacts
    pass unchanged; a doctored one is refused with the offending value
    named, like the queries self-check refuses an un-round-trippable
    key."""
    if not isinstance(s, str) or not re.fullmatch(r"[A-Za-z0-9_]+", s):
        raise SystemExit(
            f"refusing write: {context} {s!r} is not a plain "
            f"[A-Za-z0-9_]+ string (the only shape live Bench emits "
            f"and BenchPriors re-parses); fix the source artifact "
            f"instead of letting the re-pin coerce it")
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
    ap.add_argument("source", nargs="+")
    ap.add_argument("-o", "--out", default="BENCH_LOCAL.json")
    # DROPPING is the default: the policy (SCALE.md "Bench methodology")
    # is that hand re-pins never carry a storm_ratio map — those ratios
    # mean achieved-min / prior of a LIVE run, which hand-carried values
    # are not. --keep-storm-ratio exists only for restoring a pristine
    # live Bench artifact verbatim (e.g. un-poisoning the working tree
    # from a known-good BENCH_r{N}.json whose ratios ARE live ones).
    ap.add_argument("--keep-storm-ratio", action="store_true",
                    help="carry the source's storm_ratio map through "
                         "(ONLY for restoring an unmodified live Bench "
                         "artifact; hand-merged or cross-prior values "
                         "must not keep ratios)")
    ap.add_argument("--drop-storm-ratio", action="store_true",
                    help="explicit form of the default (kept for "
                         "compatibility with documented invocations)")
    ap.add_argument("--force", action="store_true",
                    help="pin a source whose own telemetry says the host "
                         "was loaded (load_avg > --max-load) anyway")
    ap.add_argument("--max-load", type=float, default=1.0,
                    help="refuse a source artifact whose load_avg exceeds "
                         "this without --force (default 1.0)")
    args = ap.parse_args()
    if args.keep_storm_ratio and args.drop_storm_ratio:
        raise SystemExit("--keep-storm-ratio and --drop-storm-ratio "
                         "are mutually exclusive")

    # byte-level spot check of the negative-zero normalization: the
    # value-level self-check below cannot see it (float parses both
    # renderings to 0.0), so assert the exact bytes here
    assert bench_fmt(-0.00003, 4) == "0.0000", bench_fmt(-0.00003, 4)
    assert bench_fmt(-1.0, 4) == "-1.0000", bench_fmt(-1.0, 4)

    if args.keep_storm_ratio and len(args.source) > 1:
        raise SystemExit("--keep-storm-ratio restores ONE unmodified live "
                         "artifact verbatim; a multi-source min-merge is "
                         "not a verbatim restore")
    sources = [(path, load_source(path)) for path in args.source]

    # Contamination guard (VERDICT r14 item 2): a prior pinned from a
    # loaded host poisons every next-round storm_ratio — and the mistake
    # has shipped twice (r13 committed a load_avg-6.89 sweep; the r14
    # boundary overwrote the tree with a load_avg-4.37 one). A source
    # that SAYS it was contended is refused unless the operator forces
    # it. A source with no load_avg (old format) passes with a note —
    # absence of telemetry is not evidence of contamination.
    for path, doc in sources:
        la = doc.get("load_avg")
        if la is not None and float(la) > args.max_load and not args.force:
            raise SystemExit(
                f"{path}: load_avg {float(la):.2f} > {args.max_load} — "
                "this sweep ran on a CONTENDED host and would poison every "
                "next-round storm ratio (the r13/r14 boundary failure). "
                "Re-measure on an idle box, or pass --force to pin it "
                "anyway.")
        if la is not None and float(la) < 0 and not args.force:
            raise SystemExit(
                f"{path}: load_avg {float(la)} is negative — a "
                "fabricated/sentinel value, not a measurement "
                "(check_prior.py rejects such a prior outright). "
                "Re-measure on a box whose telemetry is real, or pass "
                "--force.")
        if la is None:
            print(f"note: {path} carries no load_avg telemetry (old "
                  "format); contamination guard cannot check it",
                  file=sys.stderr)

    # env telemetry comes from the single source, or on a merge from
    # the source whose host was quietest (its load_avg best describes
    # the conditions the min cells were achievable under)
    src = (sources[0][1] if len(sources) == 1 else
           min((doc for _, doc in sources),
               key=lambda d: float(d.get("load_avg", 1e9))))
    if len(sources) == 1:
        queries = {k: v for k, v in src["queries"].items()}
        # hand re-pins drop failure sentinels like the merge path does
        # (a pinned -1 permanently de-arms that cell's storm escape and
        # fails check_prior); the verbatim-restore path keeps the
        # artifact as-is
        if not args.keep_storm_ratio:
            neg = sorted(k for k, v in queries.items() if v < 0)
            if neg:
                print(f"note: dropping failed-query sentinel cell(s): "
                      f"{', '.join(neg)}", file=sys.stderr)
                queries = {k: v for k, v in queries.items() if v >= 0}
    else:
        queries, dropped = {}, []
        for _, doc in sources:
            for k, v in doc["queries"].items():
                if v >= 0:
                    queries[k] = min(queries.get(k, v), v)
        # keys seen only as failure sentinels are dropped entirely — a
        # pinned -1 permanently de-arms that cell's storm escape — and
        # SAID (no silent caps)
        dropped = sorted({k for _, doc in sources for k, v in
                          doc["queries"].items() if k not in queries})
        if dropped:
            print(f"note: dropping failed-in-every-sweep cell(s): "
                  f"{', '.join(dropped)}", file=sys.stderr)
        # key order: follow the first source (Bench's sorted emit order)
        first = [k for k in sources[0][1]["queries"] if k in queries]
        queries = {k: queries[k] for k in
                   first + sorted(set(queries) - set(first))}
    storm = src.get("storm_ratio", {}) or {} if args.keep_storm_ratio else {}
    total = sum(v for v in queries.values() if v >= 0)
    # --keep-storm-ratio restores an unmodified live artifact VERBATIM:
    # carry its own total through instead of recomputing from the
    # 4dp-rounded cells, which drifted in the last decimal (ADVICE r14:
    # live 186.5023 -> recomputed 186.5029). Hand re-pins (the default
    # path) recompute: their cell set may differ from the source's.
    if args.keep_storm_ratio and "value" in src:
        total = float(src["value"])

    # query keys are safe to interpolate raw: a key the BenchPriors
    # regex cannot round-trip (backslash, quote, space) drops out of the
    # re-parse and the value-level self-check below REFUSES the write.
    # storm_ratio keys have no such check (the self-check only compares
    # the queries map), so they get the same refuse-on-alteration
    # treatment (ADVICE r16/r17: a silent sanitize could rename or
    # collide keys; refusal makes the hazard loud like the self-check).
    qs = ",".join(f'"{k}":{bench_fmt(v, 4)}' for k, v in queries.items())
    sr = ",".join(f'"{checked_id(k, "storm_ratio key")}":{bench_fmt(v, 3)}'
                  for k, v in storm.items())
    sf = src.get("sf", "/root/testdata/sf0.1")
    # env-telemetry fields: emit() always writes them between
    # storm_ratio and sf; carry them through when the source has them
    # (a live artifact always does), omit when it doesn't (an old-
    # format source) rather than fabricating environment data.
    # suite_median_storm is a statistic of the very ratios a hand
    # re-pin DROPS — measured against the OLD prior, it would ship
    # alongside an empty storm_ratio map with the same live-run-
    # semantics mismatch (ADVICE r13) — so it is carried only on the
    # verbatim-restore path (--keep-storm-ratio), omitted otherwise.
    # Ditto the live-run-relative unescaped/revisit_cleared arrays and
    # prior_* provenance: a hand re-pin never carries them (they were
    # measured against the old prior); emit() regenerates them live.
    # the verbatim-restore path also keeps the run's own storm
    # adjudication (unescaped/revisit arrays) and prior provenance —
    # dropping them would hide the very markers a restored artifact
    # exists to preserve; hand re-pins drop all of these (live-run
    # semantics, regenerated by Bench's next emit)
    esc = ""
    if args.keep_storm_ratio:
        # `watch` rides with the escape arrays: like them it is a
        # live-run-relative adjudication (derived from the very ratios a
        # hand re-pin drops), so only the verbatim-restore path keeps it.
        # Names refuse-on-alteration like storm_ratio keys (ADVICE
        # r16/r17): they are externally-sourced strings interpolated raw
        # into the output JSON, the json.loads self-check only
        # value-compares the queries map, and a silent sanitize could
        # rename a cell or emit an empty name. Live Bench names are
        # [A-Za-z0-9_], so real values pass unchanged.
        for key in ("unescaped", "revisit_cleared", "revisit_pending",
                    "watch"):
            if key in src:
                vals = ",".join(f'"{checked_id(n, f"{key} name")}"'
                                for n in (src[key] or []))
                esc += f'"{key}":[{vals}],"{key}_total":{len(src[key] or [])},'
    env = ""
    if "sibling_jvms" in src:
        env += f'"sibling_jvms":{int(src["sibling_jvms"])},'
    # load_avg only when the source MEASURED one: the old default
    # fabricated "load_avg":-1.0000 for a sibling_jvms-only source,
    # which check_prior.py then passed as verified-idle — an
    # unknown-contamination prior must FAIL the gate, not slip it
    # (ADVICE r15). Omission keeps it honest: check_prior rejects a
    # prior with no load_avg outright, naming the re-pin recipe.
    if "load_avg" in src:
        env += f'"load_avg":{bench_fmt(src["load_avg"], 4)},'
    if args.keep_storm_ratio and "suite_median_storm" in src:
        env += (f'"suite_median_storm":'
                f'{bench_fmt(src["suite_median_storm"], 4)},')
    if "boot_id" in src:
        env += f'"boot_id":"{sanitize_id(src["boot_id"])}",'
    if args.keep_storm_ratio:
        if "prior_load_avg" in src:
            env += (f'"prior_load_avg":'
                    f'{bench_fmt(src["prior_load_avg"], 4)},')
        if "prior_boot_id" in src:
            env += f'"prior_boot_id":"{sanitize_id(src["prior_boot_id"])}",'
    # corpus provenance (r16): describes the INPUT the two
    # bigram_reference_corpus cells ran over, not the live run, so it
    # carries through on every path that has it — a re-pinned prior
    # keeps the corpus-swap pin readable next to the pinned cells
    if "reference_corpus_words" in src:
        env += (f'"reference_corpus_words":'
                f'{int(src["reference_corpus_words"])},')
    line = (f'{{"metric":"total","value":{bench_fmt(total, 4)},'
            f'"unit":"sec","queries":{{{qs}}},"storm_ratio":{{{sr}}},'
            f'{esc}{env}"sf":"{sf}"}}')

    # refuse to write anything the loader cannot read back — and the
    # read-back VALUES must equal what we meant to write (a count-only
    # check once let a rounding drift ship silently)
    back = reparse_like_bench(line)
    want = {k: float(bench_fmt(v, 4)) for k, v in queries.items()}
    if back != want:
        diff = {k: (want.get(k), back.get(k))
                for k in set(want) | set(back) if want.get(k) != back.get(k)}
        raise SystemExit(f"self-check failed: re-parse differs: {diff}")
    json.loads(line)  # and it must be real JSON

    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(f"{args.out}: {len(queries)} queries, total {bench_fmt(total, 4)} s, "
          f"storm_ratio {f'{len(storm)} entries kept' if args.keep_storm_ratio else 'dropped'}"
          f"{', env fields carried' if env else ''}")


if __name__ == "__main__":
    sys.exit(main())
