"""x10 TPC-H fact tables for the round-9 crossover rehearsal.

The star-join entries (core_cte_chain_fastsum and friends) pay a
fixed broadcast-build + multi-stage scheduling floor that dominates
their sf0.1 wall; the crossover adjudication (SCALE_r09.md) needs a
lineitem/orders/customer point 10x bigger so the floor's share is
measurable instead of asserted.  Derived from the sf0.1 marginals by
key-shifted replication: copy i shifts every orderkey/custkey by
i * (max_key + 1), so join selectivity, rows-per-order and the
(n_name, order_day) group structure are preserved exactly while the
fact mass grows 10x.  Dates/prices are kept verbatim — group COUNT
stays constant and per-group mass grows 10x, which is the
amortization scenario the crossover measures.  Output to /tmp
(scratch), never /root/testdata.
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r09/x10"
FACTOR = 10


def load(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def shifted_copies(tbl: pa.Table, shifts: dict[str, int],
                   factor: int) -> pa.Table:
    outs = []
    for i in range(factor):
        cols = []
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in shifts and i > 0:
                col = pc.add(col, i * shifts[name])
            cols.append(col)
        outs.append(pa.table(dict(zip(tbl.column_names, cols))))
    return pa.concat_tables(outs)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    li = load("lineitem")
    orders = load("orders")
    cust = load("customer")
    okey_span = pc.max(orders.column("o_orderkey")).as_py() + 1
    ckey_span = pc.max(cust.column("c_custkey")).as_py() + 1

    pq.write_table(
        shifted_copies(li, {"l_orderkey": okey_span}, FACTOR),
        os.path.join(OUT, "lineitem.parquet"))
    pq.write_table(
        shifted_copies(orders, {"o_orderkey": okey_span,
                                "o_custkey": ckey_span}, FACTOR),
        os.path.join(OUT, "orders.parquet"))
    pq.write_table(
        shifted_copies(cust, {"c_custkey": ckey_span}, FACTOR),
        os.path.join(OUT, "customer.parquet"))

    # documents/events/embeddings reuse the seeded r04 x10 corpus;
    # the remaining dims are sf0.1 verbatim
    for name, src in [
        ("documents", "/tmp/scale_r04/x10/documents.parquet"),
        ("events", "/tmp/scale_r04/x10/events.parquet"),
        ("embeddings", "/tmp/scale_r04/x10/embeddings.parquet"),
        ("region", f"{SRC}/region.parquet"),
        ("nation", f"{SRC}/nation.parquet"),
        ("supplier", f"{SRC}/supplier.parquet"),
        ("part", f"{SRC}/part.parquet"),
    ]:
        dst = os.path.join(OUT, f"{name}.parquet")
        if not os.path.exists(dst) and os.path.exists(src):
            os.symlink(src, dst)
    print("done:", OUT)


if __name__ == "__main__":
    main()
