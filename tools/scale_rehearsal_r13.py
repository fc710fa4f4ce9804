"""Round-13 scale rehearsal — the three measurement debts of the r12
verdict, all Spark-side (no DuckDB oracle leg, so no watchdog):

1. **Stream-LSH floor amortization** (verdict #3): the <5s wall
   target is floor-bound, not volume-bound — prove it by replaying
   the SAME sf0.1 corpus as 3 micro-batches vs ONE production-sized
   trigger, and the x10 corpus at 3 batches.  The per-batch
   scheduling floor F falls out of (wall_b3 - wall_b1) / 2; the x10
   point shows wall growing with volume, not batch count.
2. **Embedding-index stream decomposition** (verdict #5): first
   stage telemetry for the 4.1s sweep reading — same mark() stages
   as the LSH twin (bucket / detect / publish / append / compact).
3. **Long-stream compaction proof** (verdict #6): a 30-batch
   resident replay at sf0.01 with SEGMENT_COMPACT_EVERY=4 so
   maybe_compact_segments fires ~7 times; assert the per-table
   ``_bid`` listing never exceeds every + horizon + 1 directories
   and record compaction vs non-compaction batch latencies
   separately (compaction batches pay the documented O(index)
   republish; non-compaction batches must stay flat).

Writes docs/scale_r13/rehearsal.json (checkpointed per section) and
prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "docs" / "scale_r13"
SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"
X10 = "/tmp/scale_r09/x10"


def wait_idle(budget_s: float = 420.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < budget_s:
        l1, l5, _ = os.getloadavg()
        if l1 < 0.35 and l5 < 0.8:
            break
        time.sleep(5)
    l1, l5, _ = os.getloadavg()
    return {"waited_s": round(time.time() - t0, 1),
            "loadavg": [round(l1, 2), round(l5, 2)]}


def checkpoint(doc: dict) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "rehearsal.json").write_text(
        json.dumps(doc, indent=1) + "\n", encoding="utf-8")


def main() -> None:
    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark
    import energi_data_pipeline_spark.queries.streaming as st

    load_all()
    doc: dict = {"idle_gate": wait_idle()}
    spark = get_spark("rehearsal-r13")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm the streaming code paths at the smallest SF
    st.stream_incremental_lsh_dedup(spark, "/root/testdata/sf0.001")
    st.stream_incremental_embedding_index(
        spark, "/root/testdata/sf0.001")
    spark.catalog.clearCache()

    # ---- 1. LSH floor amortization -------------------------------
    amort = {}
    for label, sf, nb, reps in (("sf0.1_b3", SF01, 3, 3),
                                ("sf0.1_b1", SF01, 1, 3),
                                ("x10_b3", X10, 3, 2)):
        if not os.path.isdir(sf):
            amort[label] = {"skipped": f"{sf} absent"}
            continue
        walls, per_batch = [], []
        for _ in range(reps):
            bt: list = []
            t0 = time.perf_counter()
            st.stream_incremental_lsh_dedup(
                spark, sf, n_batches=nb, batch_times=bt) \
                .write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
            per_batch.append([round(x, 2) for x in bt])
            spark.catalog.clearCache()
        amort[label] = {"walls_s": walls, "min_s": min(walls),
                        "batch_times_s": per_batch}
        doc["lsh_amortization"] = amort
        checkpoint(doc)
    if "min_s" in amort.get("sf0.1_b3", {}) \
            and "min_s" in amort.get("sf0.1_b1", {}):
        f = (amort["sf0.1_b3"]["min_s"]
             - amort["sf0.1_b1"]["min_s"]) / 2
        amort["per_batch_floor_est_s"] = round(f, 2)
        doc["lsh_amortization"] = amort
        checkpoint(doc)

    # ---- 2. embedding-index stream decomposition -----------------
    runs = []
    for _ in range(3):
        stg: list = []
        bt2: list = []
        t0 = time.perf_counter()
        st.stream_incremental_embedding_index(
            spark, SF01, batch_times=bt2, stage_times=stg) \
            .write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        tot: dict = {}
        for b in stg:
            for k, v in b.items():
                tot[k] = round(tot.get(k, 0.0) + v, 3)
        runs.append({"wall_s": wall, "stage_totals_s": tot,
                     "batch_times_s": [round(x, 2) for x in bt2]})
        spark.catalog.clearCache()
    doc["emb_index_decomposition"] = {
        "runs": runs,
        "min_wall_s": min(r["wall_s"] for r in runs),
    }
    checkpoint(doc)

    # ---- 3. long-stream compaction proof --------------------------
    doc["compaction_idle_gate"] = wait_idle()
    nb = 30
    every = st.SEGMENT_COMPACT_EVERY  # 4
    bt3: list = []
    listing: list = []
    t0 = time.perf_counter()
    st.stream_incremental_lsh_dedup(
        spark, SF001, n_batches=nb, batch_times=bt3,
        segment_listing=listing) \
        .write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    # bound: base(-1) + every un-compacted ids + horizon(1)
    bound = every + 1 + 1
    max_listing = max(max(row.values()) for row in listing)
    # compaction fires on bid % every == every-1 (and found work)
    comp_bids = [b for b in range(nb)
                 if b % every == every - 1 and b - 2 >= 0]
    comp_lat = [bt3[b] for b in comp_bids]
    plain_lat = [v for i, v in enumerate(bt3)
                 if i not in set(comp_bids) and i > 0]  # skip warmup b0
    third = max(1, len(plain_lat) // 3)
    doc["compaction_long_stream"] = {
        "sf_dir": SF001, "n_batches": nb, "every": every,
        "wall_s": wall,
        "listing_bound": bound,
        "max_listing_observed": max_listing,
        "listing_bound_held": max_listing <= bound,
        "per_table_listing_final": listing[-1],
        "batch_times_s": [round(x, 2) for x in bt3],
        "compaction_batches": comp_bids,
        "compaction_batch_lat_s": [round(x, 2) for x in comp_lat],
        "plain_batch_lat_median_first_third": round(
            sorted(plain_lat[:third])[third // 2], 2),
        "plain_batch_lat_median_last_third": round(
            sorted(plain_lat[-third:])[third // 2], 2),
    }
    checkpoint(doc)
    print(json.dumps({k: doc[k] for k in
                      ("lsh_amortization", "emb_index_decomposition",
                       "compaction_long_stream")},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
