"""Deterministic pins for bench.py's tree-CPU accounting (ADVICE r8:
the raw per-process delta re-counted a reaped child's lifetime when
its ticks re-arrived via the parent's cutime). Snapshots are synthetic
dicts in the exact shape `_tree_cpu_snapshot` emits —
{(pid, starttime): (ticks, parent_key)} — so the arithmetic is pinned
without process churn; the live reap experiment in BASELINE.md r9
covers the /proc side."""

from __future__ import annotations

import os

from bench import _cpu_delta

CLK = os.sysconf("SC_CLK_TCK")

ROOT = (1, 100)
JVM = (2, 200)
DAEMON = (3, 300)
WORKER = (4, 400)


def _t(ticks):
    return ticks * CLK  # express seconds as ticks for readability


def test_plain_growth_sums_per_process():
    before = {ROOT: (_t(1), None), JVM: (_t(10), ROOT)}
    after = {ROOT: (_t(2), None), JVM: (_t(14), ROOT)}
    assert _cpu_delta(before, after) == 5.0


def test_new_process_counts_in_full():
    before = {ROOT: (0, None)}
    after = {ROOT: (0, None), JVM: (_t(3), ROOT)}
    assert _cpu_delta(before, after) == 3.0


def test_reaped_child_not_double_counted():
    """Child had 10s attributed in earlier windows, burns 2 more, dies;
    parent's cutime grows by the full 12. Window delta must be ~2 (the
    residual), not 12: the child's last-seen 10 are subtracted once."""
    before = {ROOT: (0, None), DAEMON: (0, ROOT), WORKER: (_t(10), DAEMON)}
    after = {ROOT: (0, None), DAEMON: (_t(12), ROOT)}
    assert _cpu_delta(before, after) == 2.0


def test_orphaned_child_is_not_subtracted():
    """A vanished child whose parent chain LEFT the counted tree
    (reparented to init) delivers its time to nobody in the tree —
    its last-seen ticks stay singly counted from earlier windows, so
    no subtraction may happen (subtracting would go negative here)."""
    before = {ROOT: (0, None), WORKER: (_t(10), (99, 990))}
    after = {ROOT: (0, None)}
    assert _cpu_delta(before, after) == 0.0


def test_parent_and_child_both_vanish_chain_walk():
    """daemon reaps worker then dies itself; the JVM reaps the daemon.
    JVM cutime growth = daemon's own + worker's own; both vanished
    keys' last-seen ticks must be subtracted via the chain walk."""
    before = {
        ROOT: (0, None),
        JVM: (0, ROOT),
        DAEMON: (_t(5), JVM),
        WORKER: (_t(10), DAEMON),
    }
    after = {ROOT: (0, None), JVM: (_t(15) + _t(4), ROOT)}
    # 19 observed growth - 5 - 10 already-attributed = 4 residual
    assert _cpu_delta(before, after) == 4.0


def test_pid_reuse_is_new_process():
    """Same pid, different starttime: the old key vanished (subtract
    via chain), the new key counts in full."""
    before = {ROOT: (0, None), (4, 400): (_t(6), ROOT)}
    after = {ROOT: (_t(6) + _t(1), None), (4, 401): (_t(2), ROOT)}
    # root grew 7 (6 reaped + 1 own) + new process 2 - 6 attributed = 3
    assert _cpu_delta(before, after) == 3.0
