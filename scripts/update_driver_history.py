"""Regenerate plans/driver_history.py from the driver's CORRECTNESS files.

Run at the start of each round, after the driver drops CORRECTNESS_r{N}.json
in the repo root.  LATEST ROUND WINS per query: a query is
driver-verified iff its most recent row has no ``err`` and all recorded
match flags true — a regression in a later round EVICTS the name, so
the registry packer (plans/registry.py) fronts it again for re-verify
instead of parking it behind the fresh queries forever.  (A red query
can also be forced to the head of the window via registry._PINNED_FIRST.)

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
    status: dict[str, bool] = {}
    # lexicographic order matches round order (zero-padded r{NN});
    # later files overwrite earlier per-query status
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            flags = [v for k, v in row.items() if k.endswith("_match")]
            status[name] = (
                row.get("err") is None and bool(flags) and all(flags)
            )
    green = {name for name, ok in status.items() if ok}
    out = os.path.join(
        root, "airline_dataset_hadoop_public_spark", "plans", "driver_history.py"
    )
    # Guard: the CORRECTNESS history files are committed, but a clone
    # that lost them (or a bad glob) would silently evict every
    # previously-verified name and reorder the window. A shrink vs the
    # committed set only legitimately happens when a later round turns
    # a query red — surface it either way.
    try:
        sys.path.insert(0, root)
        from airline_dataset_hadoop_public_spark.plans.driver_history import (
            DRIVER_VERIFIED as prev,
        )
    except Exception:
        prev = frozenset()
    lost = sorted(prev - green)
    if lost:
        evicted_by_red = {
            n for n in lost if n in status and not status[n]
        }
        if evicted_by_red != set(lost):
            print(
                f"ERROR: {len(lost)} previously-verified names would be "
                f"evicted with no red CORRECTNESS row to justify it: "
                f"{lost[:10]}{'...' if len(lost) > 10 else ''}\n"
                "The history files are missing — aborting without writing.",
                file=sys.stderr,
            )
            sys.exit(1)
        print(
            f"note: evicting {len(lost)} name(s) whose latest driver row "
            f"turned red (will re-front for verification): {lost}",
            file=sys.stderr,
        )
    with open(out, "w") as f:
        f.write(HEADER)
        for name in sorted(green):
            f.write(f'    "{name}",\n')
        f.write("})\n")
    print(f"wrote {len(green)} driver-verified names to {out}")


if __name__ == "__main__":
    main()
