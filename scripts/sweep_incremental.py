"""Incremental adversarial sweeps (r5 verdict item 5).

220 queries x 6 axes x 2 scales made the full sweep matrix the
builder's own turnaround cost. Mid-round, correctness risk is
concentrated in queries whose CODE changed, so this runner re-sweeps
per axis only:

  - CHANGED queries: the sha256 of each query's fixture module plus
    its transitive package-local import closure (operators/, sources/,
    functions/, streaming/ — resolved by AST import scan) differs from
    the hash recorded at its last green sweep on that axis;
  - a rotating ~10% SAMPLE (deterministic per round: md5(name) + round
    mod 10 == 0), so silent environment drift is still caught within
    ten rounds even for untouched code;
  - NEVER-SWEPT queries (no recorded hash for that axis).

State lives in .scratch/sweep_state.json ({axis: {query: hash}}),
updated only for queries that came back green. The full sweep at
round close remains the closing gate (run with --full, which sweeps
everything and records all hashes); this runner is the mid-round
loop. Wall-time target: < 1/3 of a full sweep (judge's done bar).

Usage:
  python scripts/sweep_incremental.py [--full] [--round N] [axis ...]
  axes: zerorow skew nulls extremes composed planshift (default: all)
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "airline_dataset_hadoop_public_spark"
STATE_PATH = os.path.join(REPO, ".scratch", "sweep_state.json")

AXES = ["zerorow", "skew", "nulls", "extremes", "composed", "planshift"]


# ---------------------------------------------------------------------------
# per-query source hash: fixture module + transitive package imports
# ---------------------------------------------------------------------------


def _module_path(dotted: str) -> str | None:
    """Package-local dotted module -> file path (None if external)."""
    if not dotted.startswith(PKG):
        return None
    rel = dotted.split(".")
    p = os.path.join(REPO, *rel)
    if os.path.isdir(p):
        return os.path.join(p, "__init__.py")
    return p + ".py"


def _local_imports(path: str, current_pkg: str) -> list[str]:
    """Dotted names of package-local modules imported by `path`."""
    with open(path, "rb") as f:
        tree = ast.parse(f.read())
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            out.extend(a.name for a in node.names if a.name.startswith(PKG))
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against current package
                base = current_pkg.split(".")
                base = base[: len(base) - (node.level - 1)]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if not mod.startswith(PKG):
                continue
            out.append(mod)
            # `from pkg.mod import name` may import a SUBMODULE
            for a in node.names:
                out.append(f"{mod}.{a.name}")
    return out


_CLOSURE_CACHE: dict[str, frozenset[str]] = {}


def _closure(dotted: str) -> frozenset[str]:
    """Transitive package-local file closure of a dotted module.

    Computed with an iterative worklist over modules (NOT recursive
    memoization): a recursive scheme with a cycle-guard sentinel would
    cache an incomplete closure for any member of an import cycle
    (closure(B) computed mid-closure(A) would permanently omit A's
    file), silently skipping changed code in later sweeps. The worklist
    walks the full reachable module set first, then caches the complete
    file set for every visited module at once, so all members of a
    cycle share the same (complete) closure.
    """
    if dotted in _CLOSURE_CACHE:
        return _CLOSURE_CACHE[dotted]
    visited: set[str] = set()
    files: set[str] = set()
    work = [dotted]
    while work:
        mod = work.pop()
        if mod in visited:
            continue
        visited.add(mod)
        if mod in _CLOSURE_CACHE:
            files |= _CLOSURE_CACHE[mod]
            continue
        path = _module_path(mod)
        if path is None or not os.path.exists(path):
            continue
        files.add(path)
        pkg = mod if path.endswith("__init__.py") else mod.rsplit(".", 1)[0]
        work.extend(_local_imports(path, pkg))
    result = frozenset(files)
    # Only the root is safely cacheable with the full set; cached
    # sub-modules were already complete (hit above). Members first
    # reached inside this walk may have smaller true closures, so
    # they are left uncached rather than over-cached.
    _CLOSURE_CACHE[dotted] = result
    return result


def query_hashes() -> dict[str, str]:
    """query name -> sha256 over its fixture module closure sources."""
    sys.path.insert(0, REPO)
    from airline_dataset_hadoop_public_spark.plans import registry

    registry._load_all()
    file_hash: dict[str, str] = {}

    def fh(path: str) -> str:
        if path not in file_hash:
            with open(path, "rb") as f:
                file_hash[path] = hashlib.sha256(f.read()).hexdigest()
        return file_hash[path]

    out: dict[str, str] = {}
    for name, d in registry.REGISTRY.items():
        mod = f"{PKG}.plans.{d.module}"
        files = sorted(_closure(mod))
        h = hashlib.sha256()
        for p in files:
            h.update(p.encode())
            h.update(fh(p).encode())
        out[name] = h.hexdigest()
    return out


# ---------------------------------------------------------------------------
# state + selection
# ---------------------------------------------------------------------------


def load_state() -> dict:
    try:
        with open(STATE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def save_state(state: dict) -> None:
    os.makedirs(os.path.dirname(STATE_PATH), exist_ok=True)
    tmp = STATE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, STATE_PATH)


def current_round() -> int:
    import glob
    import re

    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 1


def select(
    axis: str, hashes: dict[str, str], state: dict, rnd: int
) -> tuple[list[str], dict[str, int]]:
    axis_state: dict[str, str] = state.get(axis, {})
    changed, sample, fresh = [], [], []
    for name, h in hashes.items():
        prev = axis_state.get(name)
        if prev is None:
            fresh.append(name)
        elif prev != h:
            changed.append(name)
        elif (int(hashlib.md5(name.encode()).hexdigest(), 16) + rnd) % 10 == 0:
            sample.append(name)
    names = sorted(set(changed) | set(sample) | set(fresh))
    return names, {
        "changed": len(changed),
        "sample": len(sample),
        "never_swept": len(fresh),
    }


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def run_axis(axis: str, names: list[str] | None) -> tuple[bool, float]:
    """Run one adversarial script (None = full registry). Green iff
    exit code 0 — the scripts exit nonzero on any per-query FAIL."""
    script = os.path.join(REPO, "scripts", f"adversarial_{axis}.py")
    args = [sys.executable, script]
    if axis == "planshift":
        # planshift forwards argv to check_correctness: sf_dir first
        args += ["/root/testdata/sf0.001"]
        if names:
            args += names
    else:
        args += ["/root/testdata/sf0.001"]
        args += [os.path.join(REPO, ".scratch", f"incr_{axis}")]
        if names:
            args += names
    t0 = time.time()
    rc = subprocess.call(args, cwd=REPO)
    return rc == 0, round(time.time() - t0, 1)


def main() -> int:
    argv = sys.argv[1:]
    full = "--full" in argv
    argv = [a for a in argv if a != "--full"]
    rnd = current_round()
    if argv and argv[0] == "--round":
        rnd = int(argv[1])
        argv = argv[2:]
    axes = argv or AXES
    bad = [a for a in axes if a not in AXES]
    if bad:
        print(f"unknown axes: {bad} (valid: {AXES})", file=sys.stderr)
        return 2

    hashes = query_hashes()
    state = load_state()
    overall_green = True
    for axis in axes:
        if full:
            names, why = None, {"full": len(hashes)}
            swept = list(hashes)
        else:
            names, why = select(axis, hashes, state, rnd)
            swept = names
            if not names:
                print(f"[{axis}] nothing to sweep ({why})", flush=True)
                continue
        print(
            f"[{axis}] sweeping {len(swept)}/{len(hashes)} queries {why}",
            flush=True,
        )
        green, secs = run_axis(axis, names)
        print(f"[{axis}] {'GREEN' if green else 'RED'} in {secs}s", flush=True)
        if green:
            state.setdefault(axis, {}).update(
                {n: hashes[n] for n in swept}
            )
            save_state(state)
        else:
            overall_green = False
    return 0 if overall_green else 1


if __name__ == "__main__":
    sys.exit(main())
