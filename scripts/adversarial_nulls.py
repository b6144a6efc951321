"""NULL-injection sweep: mirror a fixture dir with realistic NULLs
injected into nullable columns, then run the full registry-vs-DuckDB
compare on the mirror.

Third robustness axis (after zero-row and hot-key skew): at 100 TB,
NULLs are not an anomaly — sensor values drop, payloads go missing,
late dimensions arrive keyless, dates are unparseable. Injected here:

- events:    value NULL on every 7th event, props NULL on every 5th,
             user_id NULL on every 11th (null join/group keys!)
- orders:    o_orderdate NULL on every 13th order
- lineitem:  l_shipdate NULL on every 17th row
- documents: text NULL on every 9th doc, lang NULL on every 10th
- embeddings: embedding NULL on every 11th vector

Both engines read the same parquet, so every query keeps its full
value oracle — this checks that NULL propagation (three-valued
predicates, null group keys, aggregate skipping, join-key drops,
tokenizing null text) agrees between the Spark plans and ANSI SQL.

Usage: python scripts/adversarial_nulls.py [src_sf_dir] [dst_dir] [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from adversarial_skew import TABLES, _mask  # noqa: E402


def _null_where(tbl: pa.Table, col: str, mask) -> pa.Table:
    c = tbl[col]
    vals = c.to_pylist()
    out = [None if m else v for v, m in zip(vals, mask)]
    return tbl.set_column(
        tbl.schema.get_field_index(col), tbl.field(col),
        pa.array(out, type=c.type),
    )


def build_nulled(src: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if tbl.num_rows:
            if t == "events":
                tbl = _null_where(tbl, "value", _mask(tbl, "event_id", 7))
                tbl = _null_where(tbl, "props", _mask(tbl, "event_id", 5))
                tbl = _null_where(tbl, "user_id", _mask(tbl, "event_id", 11))
            elif t == "orders":
                tbl = _null_where(tbl, "o_orderdate", _mask(tbl, "o_orderkey", 13))
            elif t == "lineitem":
                tbl = _null_where(
                    tbl, "l_shipdate",
                    _mask(tbl, "l_orderkey", 17),
                )
            elif t == "documents":
                tbl = _null_where(tbl, "text", _mask(tbl, "doc_id", 9))
                tbl = _null_where(tbl, "lang", _mask(tbl, "doc_id", 10))
            elif t == "embeddings":
                tbl = _null_where(tbl, "embedding", _mask(tbl, "vec_id", 11))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            REPO, ".scratch",
            "nulls_" + os.path.basename(os.path.normpath(src)),
        )
    )
    only = sys.argv[3:]
    build_nulled(src, dst)
    print(f"null-injected mirror at {dst}", flush=True)
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), dst, *only]
    )


if __name__ == "__main__":
    sys.exit(main())
