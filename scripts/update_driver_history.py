"""Regenerate plans/driver_history.py from the driver's CORRECTNESS files.

Run at the start of each round, after the driver drops CORRECTNESS_r{N}.json
in the repo root.  LATEST ROUND WINS per query: a query is
driver-verified iff its most recent row has no ``err`` and all recorded
match flags true — a regression in a later round EVICTS the name, so
the registry packer (plans/registry.py) fronts it again for re-verify
instead of parking it behind the fresh queries forever.  (A red query
can also be forced to the head of the window via registry._PINNED_FIRST.)

Since r6 the file also records WHICH round each green row landed in
(``DRIVER_LAST_GREEN``): with the never-verified backlog empty, the
packer rotates the window oldest-driver-row-first so evidence
freshness is bounded — code reworked in later rounds doesn't coast
forever on an r1/r2 oracle row (r5 verdict item 1).

Usage: python scripts/update_driver_history.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HEADER = '''"""Driver CORRECTNESS history: newest green round per query.

Regenerated per round by ``scripts/update_driver_history.py`` from the
driver's CORRECTNESS_r{N}.json files. The registry's window packer
(plans/registry.py) fronts queries with no green row at all first
(round-robin across fixture modules — breadth before depth), then
rotates the rest oldest-green-row-first, so every 50-query driver
window spends its slots on the least-fresh evidence.

``DRIVER_LAST_GREEN[name]`` is the newest round whose row for ``name``
was fully green; a name whose LATEST row went red is absent entirely
(evicted — it re-fronts with the never-verified backlog).
"""

DRIVER_LAST_GREEN: dict[str, int] = {
'''

FOOTER = '''}

# Backward-compatible view: names with any surviving green row.
DRIVER_VERIFIED: frozenset[str] = frozenset(DRIVER_LAST_GREEN)
'''


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    status: dict[str, bool] = {}
    last_green: dict[str, int] = {}
    # lexicographic order matches round order (zero-padded r{NN});
    # later files overwrite earlier per-query status
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            flags = [v for k, v in row.items() if k.endswith("_match")]
            ok = row.get("err") is None and bool(flags) and all(flags)
            status[name] = ok
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    # latest-row-red evicts: drop the green history entirely so the
    # packer treats the name as never-verified (max urgency)
    green = {n: r for n, r in last_green.items() if status[n]}
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
    lost = sorted(prev - set(green))
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
            f.write(f'    "{name}": {green[name]},\n')
        f.write(FOOTER)
    from collections import Counter

    by_round = Counter(green.values())
    print(
        f"wrote {len(green)} driver-verified names to {out} "
        f"(newest-green-round histogram: "
        f"{dict(sorted(by_round.items()))})"
    )


if __name__ == "__main__":
    main()
