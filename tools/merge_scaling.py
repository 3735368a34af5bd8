#!/usr/bin/env python3
"""Merge a focused graft.Scaling run into the committed SCALING.json.

Usage: tools/merge_scaling.py SCALING.json /tmp/scaling_partial.json

The partial file's query entries replace/extend the committed artifact's
entries; factors and lineitem_rows are taken from whichever file covers
more factors. Dev tooling only (the library itself never reads this).
"""
import json
import sys


def main(committed_path: str, partial_path: str) -> None:
    with open(committed_path) as f:
        committed = json.load(f)
    with open(partial_path) as f:
        partial = json.load(f)
    if len(partial.get("factors", [])) > len(committed.get("factors", [])):
        committed["factors"] = partial["factors"]
        committed["lineitem_rows"] = partial["lineitem_rows"]
    for name, entry in partial.get("queries", {}).items():
        committed["queries"][name] = entry
    with open(committed_path, "w") as f:
        json.dump(committed, f, indent=1)
        f.write("\n")
    print(f"merged {len(partial.get('queries', {}))} entries into {committed_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
