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


WINDOW = 50  # the driver certifies the first 50 ALL_QUERIES entries


def main() -> None:
    last_green: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
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

    # Emit the upcoming certification window as an auditable round
    # record (VERDICT r11 #7): PERF's queries_dropped/newly_passing
    # lists are the 50-slot window ROTATING oldest-green-first, which
    # reads as breakage unless the intended window is on record. The
    # manifest pins, for the NEXT round, exactly which 50 names the
    # driver will check and why each is there.
    import importlib
    import sys

    sys.path.insert(0, REPO)
    for mod in [m for m in list(sys.modules) if m.startswith("lakeflow")]:
        del sys.modules[mod]
    registry = importlib.import_module("lakeflow.registry")
    window = list(registry.ALL_QUERIES)[:WINDOW]
    manifest = {
        "generated_from_round": max_round,
        "window_size": WINDOW,
        "ordering": "sentinels, never-green (registration order), then "
        "oldest-driver-green first (lakeflow/registry.py _cert_order)",
        "window": [
            {"name": n, "last_green_round": last_green.get(n)} for n in window
        ],
    }
    man_path = os.path.join(REPO, "CERT_WINDOW.json")
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"wrote {man_path}: upcoming {WINDOW}-query certification window")


if __name__ == "__main__":
    main()
