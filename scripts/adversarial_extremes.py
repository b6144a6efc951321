"""Extreme-value sweep: mirror a fixture dir with IEEE-754 specials
and degenerate payloads injected, then run the full registry-vs-DuckDB
compare on the mirror.

Fourth robustness axis (after zero-row, hot-key skew, and NULLs): at
100 TB the data WILL contain NaN sensor readings, infinities from
upstream divide-by-zero, empty and whitespace-only documents, mixed
scripts, zero vectors, and negative/out-of-domain business values.
Injected here:

- events:     value NaN on every 23rd event, +Inf on every 29th,
              -Inf on every 31st, 0.0 on every 41st.  (A 1e308
              near-max injection was tried and withdrawn: partial
              float sums overflow to +Inf or not depending on
              summation ORDER, so cross-engine equality of a plain
              SUM over such data is ill-defined — NaN/±Inf are
              absorbing and order-independent, 1e308 is not.)
- documents:  text '' on every 13th doc, whitespace-only on every
              15th, mixed-script unicode (accented Latin + Greek +
              CJK — scripts both engines case-fold identically; the
              locale-sensitive cases like Turkish dotted-I are a
              documented non-goal) on every 21st
- embeddings: one NaN element on every 19th vector, all-zero vector
              on every 29th (the zero-norm contract's production case)
- orders:     o_totalprice 0.0 on every 43rd, negative on every 47th
- lineitem:   l_discount 1.5 on every 53rd row (negative revenue)

Both engines read the same parquet, so every query keeps its full
value oracle — this checks that NaN ordering/equality, Inf
propagation, empty-input tokenization, and out-of-domain arithmetic
agree between the Spark plans and ANSI SQL.

Usage: python scripts/adversarial_extremes.py [src_sf_dir] [dst_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from adversarial_skew import TABLES, _mask  # noqa: E402

_UNI = "naïve café rendez-vous — Αθήνα αβγ 中文測試 データ 0µm"


def _replace_where(tbl: pa.Table, col: str, mask, value) -> pa.Table:
    c = tbl[col]
    vals = c.to_pylist()
    out = [value if m else v for v, m in zip(vals, mask)]
    return tbl.set_column(
        tbl.schema.get_field_index(col), tbl.field(col),
        pa.array(out, type=c.type),
    )


def _patch_vector(tbl: pa.Table, col: str, mask, fn) -> pa.Table:
    c = tbl[col]
    vals = c.to_pylist()
    out = [fn(v) if (m and v is not None) else v for v, m in zip(vals, mask)]
    return tbl.set_column(
        tbl.schema.get_field_index(col), tbl.field(col),
        pa.array(out, type=c.type),
    )


def build_extreme(src: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if tbl.num_rows:
            if t == "events":
                tbl = _replace_where(tbl, "value", _mask(tbl, "event_id", 23), math.nan)
                tbl = _replace_where(tbl, "value", _mask(tbl, "event_id", 29), math.inf)
                tbl = _replace_where(tbl, "value", _mask(tbl, "event_id", 31), -math.inf)
                tbl = _replace_where(tbl, "value", _mask(tbl, "event_id", 41), 0.0)
            elif t == "documents":
                tbl = _replace_where(tbl, "text", _mask(tbl, "doc_id", 13), "")
                tbl = _replace_where(tbl, "text", _mask(tbl, "doc_id", 15), " \t  ")
                tbl = _replace_where(tbl, "text", _mask(tbl, "doc_id", 21), _UNI)
            elif t == "embeddings":
                def nan_first(v):
                    return [math.nan] + list(v[1:])

                def zeros(v):
                    return [0.0] * len(v)

                tbl = _patch_vector(tbl, "embedding", _mask(tbl, "vec_id", 19), nan_first)
                tbl = _patch_vector(tbl, "embedding", _mask(tbl, "vec_id", 29), zeros)
            elif t == "orders":
                tbl = _replace_where(tbl, "o_totalprice", _mask(tbl, "o_orderkey", 43), 0.0)
                tbl = _replace_where(tbl, "o_totalprice", _mask(tbl, "o_orderkey", 47), -999.99)
            elif t == "lineitem":
                tbl = _replace_where(tbl, "l_discount", _mask(tbl, "l_orderkey", 53), 1.5)
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            REPO, ".scratch",
            "extremes_" + os.path.basename(os.path.normpath(src)),
        )
    )
    only = sys.argv[3:]
    build_extreme(src, dst)
    print(f"extreme-value mirror at {dst}", flush=True)
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), dst, *only]
    )


if __name__ == "__main__":
    sys.exit(main())
