"""Regenerate lakeflow/driver_green.json from the driver's CORRECTNESS files.

The JSON maps query name -> last round in which the driver recorded a fully
green row (rows_match AND schema_match AND hash_match).  The registry uses it
to order the driver-certification window oldest-green-first, so every
oracle-bearing query is re-certified on a rotation instead of going stale
(VERDICT r6 "Next round" #2).

Run after each round's CORRECTNESS_r{N}.json lands:

    python tools/gen_driver_green.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "lakeflow", "driver_green.json")


def main() -> None:
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    with open(OUT, "w") as f:
        json.dump(dict(sorted(last_green.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(last_green)} queries with a driver-green row")


if __name__ == "__main__":
    main()
