#!/usr/bin/env python3
"""Preflight testdata-drift guard (r9 verdict #6): diff the parquet FOOTER
schema of every driver-provided table, at every scale factor, against the
pinned snapshot in scripts/footers.pinned.json.

Why: the driver regenerates /root/testdata between rounds, and footer
shapes have changed silently before (r8: events.ts switched to
TIMESTAMP(NANOS) and five queries crashed at analysis time). The r8 fix
ran the timestamp-strict queries as a smoke — which only catches drift
that CRASHES. This guard catches any footer change at all, by name, before
it can turn into a silent semantics change.

Usage:
    python3 scripts/check_footers.py           # check against the pin
    python3 scripts/check_footers.py --repin   # accept current footers

Exit 1 on any drift, with a named table-by-table diff. Builder tooling:
uses driver-side pyarrow (not available to the Scala library itself).
"""
import json
import os
import sys

import pyarrow.parquet as pq

TESTDATA = "/root/testdata"
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
PIN = os.path.join(os.path.dirname(__file__), "footers.pinned.json")


def footer(path):
    """The footer schema as a stable text form (field name, arrow type,
    nullability — recursively via the arrow schema string)."""
    schema = pq.read_schema(path)
    return schema.to_string(show_field_metadata=False,
                            show_schema_metadata=False)


def current():
    out = {}
    for sf in SFS:
        for t in TABLES:
            p = f"{TESTDATA}/{sf}/{t}.parquet"
            key = f"{sf}/{t}"
            out[key] = footer(p) if os.path.exists(p) else "<MISSING FILE>"
    return out


def main():
    cur = current()
    if "--repin" in sys.argv:
        with open(PIN, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"pinned {len(cur)} footers to {PIN}")
        return 0
    if not os.path.exists(PIN):
        print(f"FAIL: no pinned snapshot at {PIN} — run with --repin once "
              "on known-good testdata", file=sys.stderr)
        return 1
    with open(PIN) as f:
        pinned = json.load(f)
    drifted = []
    for key in sorted(set(pinned) | set(cur)):
        a, b = pinned.get(key, "<NOT PINNED>"), cur.get(key, "<GONE>")
        if a != b:
            drifted.append(key)
            print(f"FOOTER DRIFT: {key}", file=sys.stderr)
            print(f"  pinned:  {a!r}", file=sys.stderr)
            print(f"  current: {b!r}", file=sys.stderr)
    if drifted:
        print(f"FAIL: {len(drifted)} footer(s) drifted from the pin: "
              f"{', '.join(drifted)} — inspect, adapt the Tables seam if "
              "needed, then --repin", file=sys.stderr)
        return 1
    print(f"footers OK: {len(cur)} table footers match the pin")
    return 0


if __name__ == "__main__":
    sys.exit(main())
