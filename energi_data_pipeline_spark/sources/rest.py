"""REST API source (Energy Data Service ``PowerSystemRightNow``).

Re-expresses bronze_ingest.py:12-43: a single-page GET with
``offset=0, start=<cursor>, sort=Minutes1UTC``.  The fetch is
driver-side (one page per run, like the reference); the records
immediately become a distributed DataFrame.  Tests inject a
``FixtureSource`` — nothing here touches the network unless
explicitly asked to.

For a truly distributed/streaming ingest see ``sources.datasource``
(the registrable ``energy_power`` format); at the reference's
one-row-a-minute feed rate a driver-side fetch is the honest design.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from datetime import datetime

API_URL = "https://api.energidataservice.dk/dataset/PowerSystemRightNow"
INITIAL_CURSOR = "2025-10-01T00:00"  # bronze_ingest.py:13


def format_cursor(cursor) -> str:
    """ISO cursor -> ``yyyy-MM-ddTHH:mm`` (bronze_ingest.py:26-30)."""
    if isinstance(cursor, str):
        cursor = datetime.fromisoformat(cursor.replace("Z", "+00:00"))
    return cursor.strftime("%Y-%m-%dT%H:%M")


class EnergyRestSource:
    """Live API fetcher (driver-side, single page per run)."""

    def __init__(self, base_url: str = API_URL, timeout: int = 30):
        self.base_url = base_url
        self.timeout = timeout

    def fetch(self, cursor) -> list[dict]:
        params = urllib.parse.urlencode({
            "offset": 0,
            "start": format_cursor(cursor),
            "sort": "Minutes1UTC",
        })
        req = urllib.request.Request(f"{self.base_url}?{params}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            if resp.status >= 300:  # raise_for_status equivalent
                raise RuntimeError(f"HTTP {resp.status}")
            data = json.loads(resp.read().decode("utf-8"))
        return data.get("records", [])


class FixtureSource:
    """Deterministic in-memory source for tests: records after the
    cursor, sorted by Minutes1UTC (the API's ``sort`` parameter)."""

    def __init__(self, records: list[dict]):
        self.records = records

    def fetch(self, cursor) -> list[dict]:
        cur = format_cursor(cursor)
        out = [r for r in self.records
               if r.get("Minutes1UTC") and r["Minutes1UTC"][:16] > cur]
        return sorted(out, key=lambda r: r["Minutes1UTC"])
