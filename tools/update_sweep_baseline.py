"""Merge sweep artifacts into the checked-in per-entry steady
baseline (r12 verdict #4).

The sweep's absolute 2s line re-flagged the same two boundary
entries (`curation_gate_overlap`, `curation_classifier_gate`) in two
consecutive rounds on readings the builder re-adjudicated bit-for-bit
at their cleared values — the threshold, not the code, was generating
work.  The fix: persist each entry's cleared steady wall and let the
sweep flag only REGRESSIONS against it (baseline * tolerance + gap),
so every flag is new information.

Usage:
    python tools/update_sweep_baseline.py SWEEP_r11.json SWEEP_r12.json

Merges by MIN: the baseline is "the best steady wall this entry has
demonstrated on an idle box" — a later slower sweep never raises it
(that would erode the regression signal), and a faster one lowers it.
A deliberate slowdown (e.g. an entry rewritten to do more work)
needs a manual edit of docs/sweep_steady_baseline.json with a note.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BASELINE_PATH = ROOT / "docs" / "sweep_steady_baseline.json"


def main() -> None:
    if BASELINE_PATH.exists():
        doc = json.loads(BASELINE_PATH.read_text(encoding="utf-8"))
    else:
        doc = {"_doc": ("per-entry cleared steady walls (seconds) on "
                        "an idle box; bench.py --sweep flags only "
                        "regressions vs these (see run_sweep). "
                        "Merged by MIN via "
                        "tools/update_sweep_baseline.py; manual "
                        "overrides allowed with a _note."),
               "entries": {}}
    entries = doc["entries"]
    for arg in sys.argv[1:]:
        art = json.loads((ROOT / arg).read_text(encoding="utf-8"))
        src = Path(arg).name
        for name, row in art["queries"].items():
            s = row.get("spark_s")
            if s is None:
                continue
            cur = entries.get(name)
            if cur is None or s < cur["steady_s"]:
                entries[name] = {"steady_s": s, "source": src}
    BASELINE_PATH.write_text(
        json.dumps(doc, indent=1, sort_keys=True) + "\n",
        encoding="utf-8")
    print(f"{len(entries)} entries -> {BASELINE_PATH}")


if __name__ == "__main__":
    main()
