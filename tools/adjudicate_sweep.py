"""Fresh-session adjudication of sweep sleeper flags (round 13).

The sweep measures 209 entries through ONE long-lived session; by
the late entries the JVM carries hours of heap/GC history and
single-execution walls read 1.5-2x their fresh-session values
(SWEEP_r13: nine regression flags, seven of which dissolved to
within the 1.4x tolerance in a fresh idle session).  A flag from a
long sweep session is therefore a DETECTION, not a verdict — this
tool is the verdict: each flagged entry re-measured min-of-3 in a
fresh python process / fresh JVM on an idle box, caches and memos
dropped between runs.

Usage:
    python tools/adjudicate_sweep.py SWEEP_r13.json
Writes <sweep>.adjudication.json next to the input and prints it.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

_CHILD = r"""
import sys, time, json, os
sys.path.insert(0, {root!r})
sys.path.insert(0, {root_tests!r})
t0 = time.time()
while time.time() - t0 < 420:
    l1, l5, _ = os.getloadavg()
    if l1 < 0.35 and l5 < 0.8:
        break
    time.sleep(5)
from energi_data_pipeline_spark.queries import load_all
from energi_data_pipeline_spark.session import get_spark
import bench
reg = load_all()
spark = get_spark("adjudicate-sweep")
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
print("ADJ_JSON:" + json.dumps(out), flush=True)
os._exit(0)
"""


def main() -> None:
    sweep_path = ROOT / (sys.argv[1] if len(sys.argv) > 1
                         else "SWEEP_r13.json")
    sweep = json.loads(sweep_path.read_text(encoding="utf-8"))
    names = sweep.get("sleepers") or []
    sf = sweep.get("sf_dir", "/root/testdata/sf0.1")
    if not names:
        print(json.dumps({"sleepers": [], "note": "nothing to do"}))
        return
    code = _CHILD.format(root=str(ROOT), root_tests=str(ROOT / "tests"),
                         names=names, sf=sf)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True,
                          timeout=3600)
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("ADJ_JSON:")), None)
    if line is None:
        raise SystemExit(f"child produced no result; stderr tail:\n"
                         f"{proc.stderr[-1500:]}")
    fresh = json.loads(line[len("ADJ_JSON:"):])
    sys.path.insert(0, str(ROOT))
    import bench  # thresholds only; no session started
    baseline = json.loads(
        (ROOT / "docs" / "sweep_steady_baseline.json")
        .read_text(encoding="utf-8"))["entries"]
    rows = {}
    for n in names:
        rs = fresh.get(n, [])
        b = (baseline.get(n) or {}).get("steady_s")
        m = min(rs) if rs else None
        if b is not None:
            still = (m is not None
                     and bench._baseline_regression(b, m))
            rule = "baseline_regression"
        else:
            # no checked-in baseline (new entry): re-apply the
            # sweep's own absolute/ratio sleeper rule to the fresh
            # idle min (r13 ADVICE — _baseline_regression(None, m)
            # is always False, which made a genuinely slow NEW entry
            # un-confirmable)
            d = (sweep["queries"].get(n) or {}).get("duckdb_s")
            still = (m is not None
                     and (m > bench.SLEEPER_ABS_S
                          or (d is not None and d > 0
                              and m / d > bench.SLEEPER_RATIO
                              and m - d > bench.SLEEPER_MIN_GAP_S)))
            rule = "sleeper_rule_no_baseline"
        rows[n] = {
            "sweep_steady_s": sweep["queries"][n]["spark_s"],
            "fresh_runs_s": rs,
            "fresh_min_s": m,
            "baseline_s": b,
            "rule": rule,
            "still_regressed": still,
            "verdict": ("REGRESSION_CONFIRMED" if still else
                        "dissolved_fresh_session"),
        }
    out = {
        "metric": "sweep_flag_adjudication",
        "sweep_artifact": sweep_path.name,
        "sf_dir": sf,
        "wall_s": round(time.time() - t0, 1),
        "tolerance": bench.SWEEP_BASELINE_TOL,
        "min_gap_s": bench.SWEEP_BASELINE_MIN_GAP_S,
        "confirmed": sorted(n for n, r in rows.items()
                            if r["still_regressed"]),
        "entries": rows,
        "note": ("fresh python process + fresh JVM, idle-gated, "
                 "min-of-3 with caches/memos dropped — the sweep's "
                 "long shared session inflates late entries 1.5-2x"),
    }
    out_path = sweep_path.with_suffix(".adjudication.json")
    out_path.write_text(json.dumps(out, indent=1) + "\n",
                        encoding="utf-8")
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
