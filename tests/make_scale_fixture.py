"""Build a derived scale-up audit tree from a driver-provided SF dir.

Usage:
    python tests/make_scale_fixture.py [copies] [src_dir] [dst_dir]
    # defaults: 10 /root/testdata/sf0.1 /tmp/sf1_audit

The tree is COPIES isomorphic universes of the source: copy 0 is the
source unchanged; copy i offsets every key column by i * (max_key + 1)
of its key domain, consistently across fact/dim tables (orders copy i
references customer copy i, lineitem copy i references orders/part/
supplier copy i).  Every join fan-out, group-size distribution, skew
shape and null pattern is therefore preserved exactly while row counts
scale COPIESx — the point is overflow / rounding / skew robustness at
~6M lineitem rows, not new data semantics.  This is an AUDIT fixture
(run the oracle suite with SPARK_GRAFT_ORACLE_SF_DIR pointed here);
the driver-provided trees stay the only input for tests and bench.

Non-key columns (including timestamps) are copied bit-for-bit with the
original Arrow schema, so e.g. nanosecond timestamp encodings survive.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: key_domain}; strides are computed per key domain
KEY_COLS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    # user_id joins customer.c_custkey (streaming PIT enrich), so it
    # MUST share the custkey stride: copy-i events reference copy-i
    # customers, not a stride-mismatched neighbor universe
    "events": {"event_id": "eventid", "user_id": "custkey"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
# key domain -> (owning table, column) for stride computation
DOMAIN_OWNER = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_audit"
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in KEY_COLS}
    stride = {
        dom: int(pc.max(tables[t][c]).as_py()) + 1
        for dom, (t, c) in DOMAIN_OWNER.items()
    }

    for t, keymap in KEY_COLS.items():
        tab = tables[t]
        if not keymap:  # pure dims: one copy, shared by every universe
            pq.write_table(tab, os.path.join(dst, f"{t}.parquet"))
            print(f"{t}: {tab.num_rows} rows (shared dim)")
            continue
        parts = [tab]
        for i in range(1, copies):
            cols = []
            for f in tab.schema:
                col = tab[f.name]
                if f.name in keymap:
                    off = pa.scalar(i * stride[keymap[f.name]], type=f.type)
                    col = pc.add(col, off)
                cols.append(col)
            parts.append(pa.table(cols, schema=tab.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {tab.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
