"""Regenerate plans/driver_history.py from the driver's CORRECTNESS files.

Run at the start of each round, after the driver drops CORRECTNESS_r{N}.json
in the repo root.  A query counts as driver-verified when any round's row
has no ``err`` and all recorded match flags true.  The registry packer
(plans/registry.py) then fronts the still-unverified queries so the next
50-query window adds maximal new evidence.

Usage: python scripts/update_driver_history.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys

HEADER = '''"""Names of queries with a driver-green CORRECTNESS row in any past round.

Regenerated per round by ``scripts/update_driver_history.py`` from the
driver's CORRECTNESS_r{N}.json files. The registry's window packer
(plans/registry.py) fronts queries NOT in this set, round-robin across
fixture modules, so each 50-query driver verification window maximizes
never-before-verified family coverage.
"""

DRIVER_VERIFIED: frozenset[str] = frozenset({
'''


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") is not None:
                continue
            flags = [v for k, v in row.items() if k.endswith("_match")]
            if flags and all(flags):
                green.add(name)
    out = os.path.join(
        root, "airline_dataset_hadoop_public_spark", "plans", "driver_history.py"
    )
    with open(out, "w") as f:
        f.write(HEADER)
        for name in sorted(green):
            f.write(f'    "{name}",\n')
        f.write("})\n")
    print(f"wrote {len(green)} driver-verified names to {out}")


if __name__ == "__main__":
    main()
