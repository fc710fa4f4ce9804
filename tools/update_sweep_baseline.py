"""(Re)build the checked-in per-entry steady baseline from sweep
artifacts (r12 verdict #4, revised r13).

The sweep's absolute 2s line re-flagged the same two boundary
entries in consecutive rounds on readings the builder re-adjudicated
bit-for-bit at their cleared values — the threshold, not the code,
was generating work.  The fix: persist each entry's TYPICAL cleared
steady wall and let the sweep flag only regressions against it.

Why MEDIAN, not min (r13 lesson): the first baseline build
min-merged SWEEP_r10-r12, which sets every baseline at the entry's
luckiest-ever session; with this box's documented ±25% weather, a
normal session then reads 1.3-1.6x the historical MIN and the 1.4x
tolerance flags pure weather (SWEEP_r13: nine flags, none a code
regression — dedup_connected_components read 4.9-5.4s across six
sweeps, its r12-only 4.395s became the baseline, and an ordinary
6.3s session "regressed").  The median across the given artifacts is
the typical wall; 1.4x over TYPICAL is a real regression.

Usage:
    python tools/update_sweep_baseline.py SWEEP_r10.json SWEEP_r11.json SWEEP_r12.json

Entries with ``pinned: true`` in the existing file are preserved
verbatim (their historical readings are known-contaminated — e.g.
the BPE family's pre-ade4506 memo-warm sweeps).
"""
from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BASELINE_PATH = ROOT / "docs" / "sweep_steady_baseline.json"


def main() -> None:
    pinned: dict = {}
    meta_extras: dict = {}
    if BASELINE_PATH.exists():
        old = json.loads(BASELINE_PATH.read_text(encoding="utf-8"))
        pinned = {n: r for n, r in old.get("entries", {}).items()
                  if r.get("pinned")}
        # preserve annotation blocks (e.g. _adjudicated_floors)
        # across rebuilds — they are adjudication state, not samples
        meta_extras = {k: v for k, v in old.items()
                       if k.startswith("_")
                       and k not in ("_doc", "_sources")}
    samples: dict[str, list[float]] = {}
    srcs = []
    for arg in sys.argv[1:]:
        art = json.loads((ROOT / arg).read_text(encoding="utf-8"))
        srcs.append(Path(arg).name)
        for name, row in art["queries"].items():
            s = row.get("spark_s")
            if s is not None:
                samples.setdefault(name, []).append(s)
    entries = {n: {"steady_s": round(statistics.median(v), 3),
                   "source": f"median of {len(v)} sweeps"}
               for n, v in samples.items()}
    entries.update(pinned)  # pins win
    doc = {"_doc": ("per-entry TYPICAL cleared steady walls (seconds,"
                    " median across the sweep artifacts named in "
                    "_sources) on an idle box; bench.py --sweep flags"
                    " only regressions vs these (see run_sweep), and "
                    "tools/adjudicate_sweep.py gives flags the "
                    "fresh-session verdict.  pinned=true entries are "
                    "preserved verbatim across rebuilds (historical "
                    "minima known-contaminated)."),
           "_sources": srcs,
           **meta_extras,
           "entries": entries}
    BASELINE_PATH.write_text(
        json.dumps(doc, indent=1, sort_keys=True) + "\n",
        encoding="utf-8")
    print(f"{len(entries)} entries ({len(pinned)} pinned) -> "
          f"{BASELINE_PATH}")


if __name__ == "__main__":
    main()
