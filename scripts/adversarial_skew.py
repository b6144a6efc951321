"""Adversarial-skew sweep: mirror a fixture dir with heavy key skew
injected, then run the full registry-vs-DuckDB compare on the mirror.

The zero-row sweep (BASELINE.md r4) probed one failure axis — empty
inputs; this probes the other one a 100 TB deployment is guaranteed to
hit: HOT KEYS. One user owns a third of all events (and one event type
half of them), one customer a third of all orders, one part a fifth of
the lineitem rows, a quarter of the corpus is one viral document, and
a quarter of the embedding set is one repeated vector. Both engines
read the SAME skewed parquet, so every query keeps its full value
oracle — this checks that skew-handling machinery (salting, hot-bucket
guards, identical-set collapse, degree-ordered orientation) changes
PLANS, never RESULTS.

Usage: python scripts/adversarial_skew.py [src_sf_dir] [dst_dir] [query ...]
Defaults: src=/root/testdata/sf0.001, dst=<repo>/.scratch/skew_sf0.001
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _mask(tbl: pa.Table, id_col: str, period: int):
    import numpy as np

    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    return np.asarray(ids) % period == 0


def _replace_where(tbl: pa.Table, col: str, mask, value) -> pa.Table:
    """Set col to `value` wherever mask holds (schema kept)."""
    c = tbl[col]
    vals = c.to_pylist()
    out = [value if m else v for v, m in zip(vals, mask)]
    return tbl.set_column(
        tbl.schema.get_field_index(col),
        tbl.field(col),
        pa.array(out, type=c.type),
    )


def _remap_int(tbl: pa.Table, col: str, period: int, hot_value) -> pa.Table:
    """Rows where col % period == 0 get the hot value (schema kept)."""
    return _replace_where(tbl, col, _mask(tbl, col, period), hot_value)


def _viral_copy(tbl: pa.Table, id_col: str, period: int, copy_cols: list[str]) -> pa.Table:
    """Rows where id % period == 0 take row 0's values in copy_cols —
    a viral duplicate cluster with the original ids kept."""
    mask = _mask(tbl, id_col, period)
    for col in copy_cols:
        donor = tbl[col].slice(0, 1).to_pylist()[0]
        tbl = _replace_where(tbl, col, mask, donor)
    return tbl


def build_skewed(src: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if t == "events" and tbl.num_rows:
            hot_user = tbl["user_id"].slice(0, 1).to_pylist()[0]
            tbl = _remap_int(tbl, "user_id", 3, hot_user)
            # every even event becomes the hot type
            tbl = _replace_where(
                tbl, "event_type", _mask(tbl, "event_id", 2), "click"
            )
        elif t == "orders" and tbl.num_rows:
            hot_cust = tbl["o_custkey"].slice(0, 1).to_pylist()[0]
            tbl = _remap_int(tbl, "o_custkey", 3, hot_cust)
        elif t == "lineitem" and tbl.num_rows:
            hot_part = tbl["l_partkey"].slice(0, 1).to_pylist()[0]
            tbl = _remap_int(tbl, "l_partkey", 5, hot_part)
        elif t == "documents" and tbl.num_rows:
            tbl = _viral_copy(tbl, "doc_id", 4, ["text", "lang", "n_chars"])
        elif t == "embeddings" and tbl.num_rows:
            tbl = _viral_copy(tbl, "vec_id", 4, ["embedding", "label"])
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".scratch", "skew_" + os.path.basename(os.path.normpath(src)))
    )
    only = sys.argv[3:]
    build_skewed(src, dst)
    print(f"skewed mirror at {dst}", flush=True)
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), dst, *only]
    )


if __name__ == "__main__":
    sys.exit(main())
