"""Rotation-policy checks for the driver-verify front window.

The external driver hash-verifies only the first 50 entries of
``load_all()``'s order each round.  Since round 14 the window policy
is STALENESS-FIRST (r13 verdict item 2): pin the entries whose most
recent driver-issued green row is oldest, so the CORRECTNESS_r*
artifact trail stays fresh across the whole 209-entry registry
instead of only the recently-touched slice.

These tests recompute per-entry staleness from the committed
CORRECTNESS_r*.json files and assert the window actually is the
50-stalest set — the policy can't silently drift from the artifacts.
"""

from __future__ import annotations

import glob
import json
import os
import re

from energi_data_pipeline_spark.queries import (
    _DRIVER_VERIFIED,
    _VERIFY_CHANGED_PINS,
    _VERIFY_FRONT_WINDOW,
    load_all,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_green_round(max_round: int | None = None) -> dict[str, int]:
    """name -> newest round whose driver CORRECTNESS row was green."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if max_round is not None and rnd > max_round:
            continue
        for name, row in json.load(open(f)).items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _expected_window(max_round: int | None = None) -> list[str]:
    """Changed-code pins first (the r08+ convention: a rewritten
    operator earns a fresh driver row before the green backlog),
    then the stalest fill to 50, oldest round then name order,
    skipping entries already pinned."""
    last = _last_green_round(max_round)
    fill = [n for n in sorted(last, key=lambda n: (last[n], n))
            if n not in _VERIFY_CHANGED_PINS]
    return list(_VERIFY_CHANGED_PINS) + \
        fill[:50 - len(_VERIFY_CHANGED_PINS)]


def test_window_is_pins_plus_stalest_fill():
    # The window must match pins + stalest-fill computed from the
    # committed CORRECTNESS files — either all of them, or all but
    # the newest round's file: the external driver writes
    # CORRECTNESS_r{N}.json at round wrap-up, AFTER the round's last
    # window rotation, so the tree is legitimately one file ahead of
    # the window until the next round rotates it.  Anything staler
    # than that one-round lag fails.
    window = list(_VERIFY_FRONT_WINDOW)
    if window == _expected_window():
        return
    rounds = sorted(
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    assert rounds and window == _expected_window(rounds[-1] - 1), (
        "front window matches neither pins+stalest-fill for the "
        "current CORRECTNESS files nor for the pre-wrap-up state — "
        "recompute when rotating"
    )


def test_window_holds_50_entries_and_pins_lead():
    assert len(_VERIFY_FRONT_WINDOW) == 50
    assert _VERIFY_FRONT_WINDOW[:len(_VERIFY_CHANGED_PINS)] == \
        _VERIFY_CHANGED_PINS


def test_load_all_puts_window_first_and_covers_registry():
    names = list(load_all())
    assert names[:50] == list(_VERIFY_FRONT_WINDOW)
    assert len(names) == len(set(names))
    # every registry entry has carried a driver green row at least once
    last = _last_green_round()
    missing = [n for n in names if n not in last and n in _DRIVER_VERIFIED]
    assert not missing, missing


def test_every_window_entry_exists_in_registry():
    names = set(load_all())
    unknown = [n for n in _VERIFY_FRONT_WINDOW if n not in names]
    assert not unknown, unknown
