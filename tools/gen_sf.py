"""Synthesize a larger scale factor from a driver-generated sf directory.

The driver's testdata is read-only and capped at sf0.1; scale rehearsal
(does every plan's wall-time scale ~linearly? does any plan flip to a
scale-killer shape?) needs a bigger input.  This replicates a source sf
directory K times with KEY STRIDING: every key/foreign-key column is
offset by `replica * stride` with one stride per key domain, so join
fan-outs, key cardinalities, and group counts all scale by K exactly like
a real larger scale factor would, while value distributions stay
identical.  Non-key payloads (text, embeddings, timestamps) are repeated
verbatim — fine for timing, NOT a correctness oracle input.

pyarrow end-to-end: physical types (e.g. events.ts TIMESTAMP(NANOS))
survive byte-identical, so the Spark read path at sfK exercises exactly
the same reader code as the driver's data.

Usage: python tools/gen_sf.py <src_sf_dir> <dst_dir> <factor>
   e.g. python tools/gen_sf.py /root/testdata/sf0.1 /tmp/sfgen/sf1 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key domain -> columns belonging to it (table.column)
DOMAINS = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "ord": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "ev": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}

COPY_AS_IS = ("region", "nation")
SCALED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _strides(src: str) -> dict[str, int]:
    """One stride per key domain: past the max over every column in the
    domain, rounded up to a power of 10 so striped keys are readable."""
    out: dict[str, int] = {}
    for dom, cols in DOMAINS.items():
        hi = 0
        for table, col in cols:
            p = os.path.join(src, f"{table}.parquet")
            if not os.path.exists(p):
                continue
            t = pq.read_table(p, columns=[col])
            m = pc.max(t.column(0)).as_py()
            hi = max(hi, int(m or 0))
        stride = 10
        while stride <= hi:
            stride *= 10
        out[dom] = stride
    return out


def _shift_cols(table_name: str) -> dict[str, str]:
    return {
        col: dom
        for dom, cols in DOMAINS.items()
        for t, col in cols
        if t == table_name
    }


def generate(
    src: str, dst: str, factor: int, only: tuple[str, ...] | None = None
) -> None:
    """`only` restricts generation to a table subset (plus the tiny
    COPY_AS_IS dims) — the sf100 family rehearsal needs documents/
    embeddings/events, not a 10 GB lineitem."""
    os.makedirs(dst, exist_ok=True)
    strides = _strides(src)
    for name in COPY_AS_IS:
        p = os.path.join(src, f"{name}.parquet")
        if os.path.exists(p):
            pq.write_table(pq.read_table(p), os.path.join(dst, f"{name}.parquet"))
            print(f"{name}: copied")
    for name in SCALED:
        if only is not None and name not in only:
            continue
        p = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p)
        shift = _shift_cols(name)
        # one output part file per replica → Spark/DuckDB read the
        # directory; replica 0 is byte-equal to the source data
        out_dir = os.path.join(dst, f"{name}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(factor):
            if i == 0:
                rep = t
            else:
                arrays = []
                for field in t.schema:
                    col = t.column(field.name)
                    if field.name in shift:
                        off = i * strides[shift[field.name]]
                        col = pc.add(col, pa.scalar(off, type=field.type))
                    arrays.append(col)
                rep = pa.table(arrays, schema=t.schema)
            pq.write_table(rep, os.path.join(out_dir, f"part-{i:03d}.parquet"))
        print(f"{name}: {t.num_rows} rows x {factor}")


if __name__ == "__main__":
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    only = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    generate(src, dst, factor, only)
