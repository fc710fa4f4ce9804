"""Reference-shaped test fixture (FIXTURES.md §1).

Deterministic PowerSystemRightNow-like records: minute cadence with
gaps, a weekend, the Nov->Dec season boundary, zero-production and
zero-solar rows (exercising both CASE-guard defaults), and a
NULL-timestamp record.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

API_FIELDS = [
    "CO2Emission", "ProductionGe100MW", "ProductionLt100MW",
    "SolarPower", "OffshoreWindPower", "OnshoreWindPower",
    "ExchangeSum", "ExchangeDK1_DE", "ExchangeDK2_DE", "ExchangeDK1_NL",
    "ExchangeDK1_GB", "ExchangeDK1_NO", "ExchangeDK1_SE",
    "ExchangeDK2_SE", "ExchangeDK1_DK2",
]

#: contiguous minute spans (start, n_minutes) — weekday, weekend
#: (Sat Nov 29) and the fall->winter season boundary (Nov 30 -> Dec 1)
SPANS = [
    (datetime(2025, 10, 25, 12, 0), 180),
    (datetime(2025, 11, 29, 10, 0), 120),
    (datetime(2025, 11, 30, 23, 0), 120),
]


def make_power_records(seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    records: list[dict] = []
    for start, n in SPANS:
        for i in range(n):
            if rng.random() < 0.05:  # gaps: rows-frame ≠ time-frame
                continue
            ts = start + timedelta(minutes=i)
            hour_frac = (ts.hour + ts.minute / 60) / 24
            solar = max(0.0, 600 * math.sin(math.pi * (hour_frac - 0.25)
                                            / 0.5)) \
                if 6 <= ts.hour < 18 else 0.0
            rec = {
                "Minutes1UTC": ts.strftime("%Y-%m-%dT%H:%M:%S"),
                "CO2Emission": round(rng.gauss(80, 20), 2),
                "ProductionGe100MW": round(max(0, rng.gauss(1500, 300)), 2),
                "ProductionLt100MW": round(max(0, rng.gauss(400, 100)), 2),
                "SolarPower": round(solar, 2),
                "OffshoreWindPower": round(max(0, rng.gauss(900, 400)), 2),
                "OnshoreWindPower": round(max(0, rng.gauss(700, 300)), 2),
                "ExchangeSum": round(rng.gauss(0, 500), 2),
                "ExchangeDK1_DE": round(rng.gauss(0, 200), 2),
                "ExchangeDK2_DE": round(rng.gauss(0, 200), 2),
                "ExchangeDK1_NL": round(rng.gauss(0, 150), 2),
                "ExchangeDK1_GB": round(rng.gauss(0, 150), 2),
                "ExchangeDK1_NO": round(rng.gauss(0, 300), 2),
                "ExchangeDK1_SE": round(rng.gauss(0, 200), 2),
                "ExchangeDK2_SE": round(rng.gauss(0, 200), 2),
                "ExchangeDK1_DK2": round(rng.gauss(0, 250), 2),
            }
            if rng.random() < 0.02:  # renewable_ratio ELSE 0 guard
                rec["ProductionGe100MW"] = 0.0
                rec["ProductionLt100MW"] = 0.0
            records.append(rec)
    # one NULL-keyed record (silver fact NULL filter)
    records.append({"Minutes1UTC": None,
                    **{f: 1.0 for f in API_FIELDS}})
    return records
