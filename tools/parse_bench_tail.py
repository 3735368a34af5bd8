#!/usr/bin/env python3
"""Replay the bench-consumer's tail extraction over a saved output tail.

The bench artifact protocol is "take the LAST stdout line and parse it
as JSON" over a BOUNDED tail of the run's captured output. Rounds 8-11
recorded `parsed: null` because the last captured line was sbt's
`[success] Total time: ...` banner, not Bench's compact JSON line (the
JSON lines themselves also arrived `[info]`-prefixed through sbt's
logger). build.sbt now suppresses the banner (`Global / showSuccess :=
false`) and pipes forked run output straight through
(`run / outputStrategy := Some(StdoutOutput)`), and Bench re-prints the
compact line from a JVM shutdown hook, so the final line of the whole
invocation is the bare JSON artifact.

This tool makes "the driver will parse it" testable locally:

    python3 tools/parse_bench_tail.py <file> [--strict]

<file> is either a raw captured-output file (the last N bytes of an
actual `sbt "runMain graft.Bench"` run) or a committed BENCH_r{N}.json
(whose "tail" field holds the driver's real capture). Two extraction
modes, reported side by side:

  strict  — json.loads(last non-empty line), nothing else: the most
            brittle consumer imaginable. This is the mode the r11 tail
            FAILS (its last line is the [success] banner) and any
            post-fix tail must PASS.
  lenient — walk lines last-to-first, strip one sbt log tag
            (`[info] `/`[error] `/`[warn] `) if present, parse the
            first line that is a complete JSON object.

Exit code 0 iff STRICT extraction succeeds (the fix's bar: if the
brittlest consumer parses it, any consumer does).
"""
import json
import sys


def _candidate_lines(text):
    return [ln for ln in text.splitlines() if ln.strip()]


def parse_strict(text):
    """json.loads of the last non-empty line, or None."""
    lines = _candidate_lines(text)
    if not lines:
        return None
    try:
        v = json.loads(lines[-1].strip())
        return v if isinstance(v, dict) else None
    except (ValueError, TypeError):
        return None


def parse_lenient(text):
    """Last line (tag-stripped) that parses as a JSON object, or None."""
    for raw in reversed(_candidate_lines(text)):
        line = raw.strip()
        for tag in ("[info] ", "[error] ", "[warn] ", "[debug] "):
            if line.startswith(tag):
                line = line[len(tag):]
                break
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            v = json.loads(line)
            if isinstance(v, dict):
                return v
        except ValueError:
            continue
    return None


def load_tail(path):
    """Raw tail text: either the file itself, or its 'tail' field when
    the file is a committed BENCH_r{N}.json artifact."""
    with open(path, encoding="utf-8", errors="replace") as f:
        body = f.read()
    try:
        as_json = json.loads(body)
        if isinstance(as_json, dict) and "tail" in as_json:
            return as_json["tail"]
    except ValueError:
        pass
    return body


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    tail = load_tail(argv[1])
    strict = parse_strict(tail)
    lenient = parse_lenient(tail)

    def describe(name, v):
        if v is None:
            print(f"{name}: null")
        else:
            keys = ", ".join(sorted(v.keys()))
            print(f"{name}: parsed ({len(v)} keys: {keys})")
            if "value" in v:
                print(f"  total={v.get('value')} "
                      f"queries_done={v.get('queries_done')} "
                      f"sf={v.get('sf')}")

    describe("strict ", strict)
    describe("lenient", lenient)
    return 0 if strict is not None else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
