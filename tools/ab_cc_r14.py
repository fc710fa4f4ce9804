"""Interleaved A/B: HEAD vs the round-12 tree for the CC family (r14).

The r13 verdict's top item: `dedup_connected_components` /
`_star` / `dedup_cluster_keep_best` fresh idle minimums read
1.5-1.6x their best-ever baselines, and the sweep flags dissolved
only because baselines were re-based to medians in the SAME round
that modified this exact family (the graph.py:36 edge checkpoint,
commit abf55ef).  A checkpoint-on/off A/B was neutral, so the cause
is unestablished — this tool adjudicates TREE vs TREE: the current
HEAD against the full round-12 tree (commit cd32396, before any r13
change), interleaved on the same box in the same hour, each
measurement in a fresh python process + fresh JVM, idle-gated,
min-of-3 with caches dropped (the adjudicate_sweep.py conditions),
with a fixed single-threaded DuckDB control per child so cycles can
be weather-labeled individually.

Usage:
    git worktree add .ab/r12 cd32396     # once; .ab/ is gitignored
    python tools/ab_cc_r14.py [n_cycles] # default 4 -> 8 children
Writes docs/scale_r14/ab_cc.json and prints the adjudication.
"""
from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
R12 = ROOT / ".ab" / "r12"
SF = "/root/testdata/sf0.1"
QUERIES = ["dedup_connected_components",
           "dedup_connected_components_star",
           "dedup_cluster_keep_best"]
#: best-ever fresh-session minimums the r13 adjudication compared
#: against (SWEEP_r13.adjudication.json baseline_min_merge_s)
BEST_EVER = {"dedup_connected_components": 4.395,
             "dedup_connected_components_star": 3.105,
             "dedup_cluster_keep_best": 4.513}

_CHILD = r"""
import sys, time, json, os
sys.path.insert(0, {root!r})
sys.path.insert(0, {root_tests!r})
import bench
bench.wait_for_idle()  # the repo's one idle gate (review r14)
import duckdb
def duck_control():
    # fixed single-threaded CPU workload, data-independent: a pure
    # box-speed thermometer (same spirit as capture_weather's duck
    # control, but identical across both trees by construction)
    con = duckdb.connect()
    con.execute("SET threads=1")
    t = time.perf_counter()
    con.execute("SELECT sum(hash(range)) FROM range(30000000)").fetchall()
    w = time.perf_counter() - t
    con.close()
    return round(w, 3)
duck_before = duck_control()
from energi_data_pipeline_spark.queries import load_all
from energi_data_pipeline_spark.session import get_spark
import bench
reg = load_all()
spark = get_spark("ab-cc-r14")
spark.range(1_000_000).selectExpr("sum(id)").collect()
names = {names!r}
sf = {sf!r}
warm = bench.warmup_dir(sf)
for n in names:
    if warm:
        try:
            reg[n].fn(spark, warm).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
        bench.drop_measurement_caches(spark)
out = {{}}
for n in names:
    rs = []
    for _ in range(3):
        t0 = time.perf_counter()
        reg[n].fn(spark, sf).write.format("noop") \
            .mode("overwrite").save()
        rs.append(round(time.perf_counter() - t0, 3))
        bench.drop_measurement_caches(spark)
    out[n] = rs
duck_after = duck_control()
print("AB_JSON:" + json.dumps(
    {{"runs": out, "duck_before": duck_before,
      "duck_after": duck_after,
      "loadavg": [round(x, 2) for x in os.getloadavg()[:2]]}}),
    flush=True)
os._exit(0)
"""


def run_child(tree: Path) -> dict:
    code = _CHILD.format(root=str(tree), root_tests=str(tree / "tests"),
                         names=QUERIES, sf=SF)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True,
                          timeout=1800, cwd=str(tree))
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("AB_JSON:")), None)
    if line is None:
        raise SystemExit(f"child in {tree} produced no result; stderr "
                         f"tail:\n{proc.stderr[-1500:]}")
    return json.loads(line[len("AB_JSON:"):])


def main() -> None:
    # optional: compare against a different base worktree (e.g. the
    # pre-change HEAD for an optimization A/B) and name the output
    base = Path(sys.argv[2]) if len(sys.argv) > 2 else R12
    out_name = sys.argv[3] if len(sys.argv) > 3 else "ab_cc.json"
    base_label = "r12" if base == R12 else "base"
    if not base.exists():
        raise SystemExit(f"worktree {base} missing — git worktree "
                         f"add {base} <commit>")
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    t_start = time.time()
    obs: dict[str, list[dict]] = {"head": [], base_label: []}
    for c in range(cycles):
        order = [("head", ROOT), (base_label, base)]
        if c % 2:  # flip order every cycle to cancel slow drift
            order.reverse()
        for label, tree in order:
            r = run_child(tree)
            r["cycle"] = c
            obs[label].append(r)
            print(f"cycle {c} {label}: duck={r['duck_before']}/"
                  f"{r['duck_after']} "
                  + " ".join(f"{n.split('_')[-1]}={r['runs'][n]}"
                             for n in QUERIES), flush=True)
    rows = {}
    for n in QUERIES:
        h = [w for r in obs["head"] for w in r["runs"][n]]
        o = [w for r in obs[base_label] for w in r["runs"][n]]
        hm, om = min(h), min(o)
        rows[n] = {
            "head_runs_s": h, f"{base_label}_runs_s": o,
            "head_min_s": hm, f"{base_label}_min_s": om,
            "head_median_s": round(statistics.median(h), 3),
            f"{base_label}_median_s": round(statistics.median(o), 3),
            f"head_over_{base_label}_min": round(hm / om, 3),
            "best_ever_baseline_s": BEST_EVER[n],
            "head_over_best_ever": round(hm / BEST_EVER[n], 3),
            f"{base_label}_over_best_ever": round(om / BEST_EVER[n],
                                                  3),
        }
    ducks = [r[k] for t in obs.values() for r in t
             for k in ("duck_before", "duck_after")]
    out = {
        "metric": f"ab_cc_head_vs_{base_label}",
        "base_worktree": str(base),
        "sf_dir": SF, "cycles": cycles,
        "wall_s": round(time.time() - t_start, 1),
        "duck_control_runs_s": ducks,
        "duck_control_spread": round(max(ducks) / min(ducks), 3),
        "queries": rows,
        "per_child": obs,
        "note": ("fresh process + fresh JVM per child, idle-gated, "
                 "min-of-3 caches dropped, order flipped per cycle; "
                 "duck control is a fixed single-threaded hash loop "
                 "(box thermometer, tree-independent)"),
    }
    dst = ROOT / "docs" / "scale_r14"
    dst.mkdir(parents=True, exist_ok=True)
    (dst / out_name).write_text(json.dumps(out, indent=1) + "\n",
                                encoding="utf-8")
    print(json.dumps({k: {"head_min": v["head_min_s"],
                          f"{base_label}_min": v[f"{base_label}_min_s"],
                          "ratio": v[f"head_over_{base_label}_min"]}
                      for k, v in rows.items()}, indent=1))


if __name__ == "__main__":
    main()
