"""Unit tests for bench.py's measurement guards (no Spark session).

Round-12 verdict #2 + ADVICE: the spread-based contamination flag is
blind to a uniformly slow box, and the cold-first-run exclusion could
silently absorb genuine first-run-only contamination.  These pin the
four run-list shapes the r12 commit message adjudicated ad hoc, the
new compilation-sized cap on the exclusion, and the capture-level
weather signal that compares the DuckDB control against the trailing
median of committed captures.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (COLD_EXCESS_CAP_S, WEATHER_DEGRADED_RATIO,
                   _cold_first_tail, _run_spread_contaminated,
                   capture_weather)


class TestSpreadShapes:
    def test_tight_list_clean(self):
        assert not _run_spread_contaminated([0.52, 0.50, 0.51])

    def test_cold_first_compilation_sized_excluded(self):
        # 1.2 -> 0.3 -> 0.3: spread 4x would flag, but the first run
        # is slowest and its excess (0.9s) is compilation-sized
        runs = [1.2, 0.3, 0.3]
        assert _cold_first_tail(runs, True) == ([0.3, 0.3], True)
        assert not _run_spread_contaminated(runs,
                                            exclude_cold_first=True)

    def test_cold_first_contamination_sized_flags(self):
        # r12 ADVICE: 7.2 -> 2.3 -> 2.3 has the cold-start SHAPE but
        # a 4.9s excess — no codegen costs that; keep the list, flag
        runs = [7.2, 2.3, 2.3]
        assert runs[0] - min(runs[1:]) > COLD_EXCESS_CAP_S
        assert _cold_first_tail(runs, True) == (runs, False)
        assert _run_spread_contaminated(runs, exclude_cold_first=True)

    def test_mid_capture_degradation_flags(self):
        # r12 capture #3 shape: first run FASTEST (box degraded
        # mid-capture) — exclusion must not apply
        runs = [3.45, 12.0, 10.9]
        assert _cold_first_tail(runs, True) == (runs, False)
        assert _run_spread_contaminated(runs, exclude_cold_first=True)

    def test_duck_lists_never_exclude(self):
        # DuckDB has no per-SF codegen: an inflated first duck run is
        # the r10 smoking-gun shape
        assert _run_spread_contaminated([2.5, 0.5, 0.5])

    def test_two_run_list_no_exclusion(self):
        # exclusion needs >=3 runs (a 1-run tail can't spread)
        assert _cold_first_tail([1.2, 0.3], True) == ([1.2, 0.3],
                                                      False)


class TestBurstDefense:
    """r13 verdict #3: repeat-until-two-agree for headline entries.
    The round's own evidence — curation_cluster_representatives read
    6.7-9.5s in one capture and 2.4-3.3s in another on the SAME tree
    — while the spread flag, the idle gate, and the whole-capture
    weather median all passed."""

    def test_synthetic_burst_is_caught(self):
        from bench import _needs_burst_rerun
        # all three runs inside a burst: no two agree within 15%
        assert _needs_burst_rerun([6.7, 8.1, 9.5])

    def test_stable_list_does_not_rerun(self):
        from bench import _needs_burst_rerun
        assert not _needs_burst_rerun([2.4, 2.5, 3.3])   # 2.4~2.5
        assert not _needs_burst_rerun([1.0, 1.1, 9.0])   # 1.0~1.1

    def test_burst_then_clean_pair_resolves(self):
        from bench import _needs_burst_rerun
        # the re-run escapes the burst: two clean readings agree
        assert _needs_burst_rerun([6.7, 9.5, 12.0])
        assert _needs_burst_rerun([6.7, 9.5, 12.0, 2.4])
        assert not _needs_burst_rerun([6.7, 9.5, 12.0, 2.4, 2.5])

    def test_over_cutoff_never_reruns(self):
        from bench import RERUN_CUTOFF_S, _needs_burst_rerun
        assert not _needs_burst_rerun([RERUN_CUTOFF_S + 10,
                                       RERUN_CUTOFF_S + 50])

    def test_single_run_asks_for_a_second(self):
        from bench import _needs_burst_rerun
        assert _needs_burst_rerun([3.0])
        assert not _needs_burst_rerun([])


class TestSweepBurstDefense:
    """r14 verdict #7: the sweep's steady pass must keep re-running a
    would-be flag until two readings agree — a synthetic burst that
    decays across the base 3-run window must NOT stop at 3 runs."""

    def test_synthetic_burst_forces_extra_runs(self):
        from bench import collect_steady_runs
        feed = iter([6.0, 4.5, 3.0, 2.9])  # no adjacent pair agrees
        runs, added = collect_steady_runs(9.0, lambda: next(feed))
        # re-ran until 3.0 vs 2.9 agreed (within 1.15x)
        assert runs == [9.0, 6.0, 4.5, 3.0, 2.9]
        assert added == 2
        assert min(runs) == 2.9  # the post-burst reading wins

    def test_agreeing_runs_stop_at_base_three(self):
        from bench import collect_steady_runs
        feed = iter([2.1, 2.0, 99.0])
        runs, added = collect_steady_runs(2.3, lambda: next(feed))
        assert runs == [2.3, 2.1, 2.0]
        assert added == 0

    def test_capped_at_burst_max_runs(self):
        from bench import BURST_MAX_RUNS, collect_steady_runs
        vals = iter([50.0 / (2.0 ** i) for i in range(1, 10)])
        runs, added = collect_steady_runs(50.0, lambda: next(vals))
        assert len(runs) == BURST_MAX_RUNS  # honest capped record

    def test_error_mid_burst_keeps_partial_record(self):
        from bench import collect_steady_runs
        feed = iter([6.0, 4.5, None])
        runs, added = collect_steady_runs(9.0, lambda: next(feed))
        assert runs == [9.0, 6.0, 4.5]
        assert added == 0


class TestCompactLine:
    def test_fits_within_budget_by_dropping_lowest_priority(self):
        # r14 verdict #4: BENCH_r13/r14 carried parsed:null because
        # the compact line crept past the driver's 2000-char tail —
        # the emitter must enforce the budget structurally
        from bench import fit_compact_line
        core = {"metric": "m", "value": 1.0,
                "queries": {f"q{i:03d}": 1.23 for i in range(60)}}
        optional = [("keep_me", {"a": 1}),
                    ("mid", {"b": list(range(50))}),
                    ("drop_first", {"c": ["x" * 400]})]
        line, dropped = fit_compact_line(core, optional, budget=1200)
        assert len(line) <= 1200
        d = json.loads(line)
        assert d["queries"]["q059"] == 1.23  # core survives intact
        assert "keep_me" in d
        assert dropped and dropped[0] == "drop_first"

    def test_no_drop_when_it_fits(self):
        from bench import fit_compact_line
        line, dropped = fit_compact_line(
            {"a": 1}, [("b", 2), ("c", 3)], budget=2000)
        assert json.loads(line) == {"a": 1, "b": 2, "c": 3}
        assert dropped == []

    def test_core_alone_over_budget_still_emits(self):
        # the guard never raises mid-capture: a pathological core
        # emits as-is (BENCH_LAST.json remains the durable record)
        from bench import fit_compact_line
        core = {"queries": {f"q{i}": 1.0 for i in range(500)}}
        line, dropped = fit_compact_line(core, [("x", 1)], budget=100)
        assert json.loads(line) == core
        assert dropped == ["x"]

    def test_default_budget_under_driver_tail(self):
        from bench import COMPACT_LINE_BUDGET
        assert COMPACT_LINE_BUDGET <= 1950  # driver keeps last 2000

    def test_core_with_all_headline_queries_fits_budget(self):
        # r15 verdict #6: the r13/r14 parsed:null overflows came from
        # field accretion — the REQUIRED (never-dropped) core with
        # every headline query present must fit the budget ON ITS
        # OWN, at worst-case numeric widths, so the driver's
        # 2000-char tail parses even when every optional diagnostic
        # is dropped.  Mirrors main()'s core dict field-for-field;
        # adding a core field or a headline query re-runs this math.
        from bench import (COMPACT_LINE_BUDGET, HEADLINE,
                           ORACLE_EXACT_ANCHORS, PATHOLOGICAL_ORACLES,
                           fit_compact_line)
        core = {
            "metric": "headline_queries_total_wall",
            "value": 9999.999, "unit": "sec",
            "queries": {n: 999.99 for n in HEADLINE},
            "sf": 0.1, "duckdb_total": 99999.999,
            "ratio_vs_duckdb": 99.999,
            "value_ex_outlier": 9999.999,
            "duckdb_total_ex_outlier": 99999.999,
            "ratio_ex_outlier": 99.999,
            "session_floor_s": 0.999,
            "ratio_ex_outlier_floor_adjusted": 99.999,
            "outliers_dropped": PATHOLOGICAL_ORACLES,
            "parity_variants": ORACLE_EXACT_ANCHORS,
            "full_artifact": "BENCH_LAST.json",
        }
        line, dropped = fit_compact_line(core, [])
        assert dropped == []
        assert len(line) <= COMPACT_LINE_BUDGET, len(line)
        assert json.loads(line)["queries"] == core["queries"]


def _ref(path: Path, queries: dict, outliers: list,
         duck_ex: float, sf: float = 0.1, wrap: bool = False):
    d = {"queries": queries, "outliers_dropped": outliers,
         "duckdb_total_ex_outlier": duck_ex, "sf": sf}
    path.write_text(json.dumps({"parsed": d} if wrap else d),
                    encoding="utf-8")


class TestCaptureWeather:
    Q = {"a": 1.0, "b": 2.0, "c": 3.0}

    def test_degraded_capture_flags(self, tmp_path):
        for i, v in enumerate([14.0, 14.5, 13.8, 14.2]):
            _ref(tmp_path / f"BENCH_r{i:02d}.json", self.Q, ["c"], v,
                 wrap=(i % 2 == 0))  # both driver + builder formats
        w = capture_weather(20.5, {"a", "b"}, 0.1, root=tmp_path)
        assert w["capture_degraded"] is True
        assert w["duck_vs_trailing_median"] > WEATHER_DEGRADED_RATIO
        assert w["n_reference_captures"] == 4

    def test_idle_capture_clean(self, tmp_path):
        for i, v in enumerate([14.0, 14.5, 13.8]):
            _ref(tmp_path / f"BENCH_r{i:02d}.json", self.Q, ["c"], v)
        w = capture_weather(13.9, {"a", "b"}, 0.1, root=tmp_path)
        assert w["capture_degraded"] is False
        assert w["verdict"] == "normal"

    def test_set_mismatch_and_sf_mismatch_skipped(self, tmp_path):
        _ref(tmp_path / "BENCH_r01.json", self.Q, ["c"], 14.0)
        # different ex-outlier set (composition change)
        _ref(tmp_path / "BENCH_r02.json", {"a": 1.0}, [], 3.0)
        # different SF
        _ref(tmp_path / "BENCH_r03.json", self.Q, ["c"], 1.2, sf=0.01)
        w = capture_weather(14.0, {"a", "b"}, 0.1, root=tmp_path)
        assert w["n_reference_captures"] == 1
        assert w["verdict"] == "insufficient_references"
        assert "capture_degraded" not in w

    def test_degraded_references_skipped(self, tmp_path):
        # r13 ADVICE: a reference whose OWN stamped verdict was
        # DEGRADED_BOX must not enter the trailing median — else the
        # baseline slowly absorbs degraded rounds and mutes itself
        for i, v in enumerate([14.0, 14.5, 13.8]):
            _ref(tmp_path / f"BENCH_r{i:02d}.json", self.Q, ["c"], v)
        d = {"queries": self.Q, "outliers_dropped": ["c"],
             "duckdb_total_ex_outlier": 25.0, "sf": 0.1,
             "capture_weather": {"verdict": "DEGRADED_BOX"}}
        (tmp_path / "BENCH_r04.json").write_text(json.dumps(d),
                                                 encoding="utf-8")
        w = capture_weather(18.6, {"a", "b"}, 0.1, root=tmp_path)
        assert w["n_reference_captures"] == 3  # degraded ref excluded
        assert w["capture_degraded"] is True   # 18.6 vs median 14.0

    def test_sustained_degradation_rebaselines(self, tmp_path):
        # r14 ADVICE: after WEATHER_REBASELINE_AFTER consecutive
        # DEGRADED_BOX captures, the degraded refs age back into the
        # pool (sustained degradation IS the new epoch) — otherwise a
        # permanent >1.3x slowdown flags every future capture forever
        from bench import WEATHER_REBASELINE_AFTER
        for i, v in enumerate([7.0, 7.1, 6.9]):
            _ref(tmp_path / f"BENCH_r{i:02d}.json", self.Q, ["c"], v)
        for i in range(WEATHER_REBASELINE_AFTER):
            d = {"queries": self.Q, "outliers_dropped": ["c"],
                 "duckdb_total_ex_outlier": 14.0, "sf": 0.1,
                 "capture_weather": {"verdict": "DEGRADED_BOX"}}
            (tmp_path / f"BENCH_r{10 + i:02d}.json").write_text(
                json.dumps(d), encoding="utf-8")
        w = capture_weather(14.0, {"a", "b"}, 0.1, root=tmp_path)
        # degraded refs are back in: 3x 7.0 + 3x 14.0 -> median 10.5,
        # 14.0/10.5 = 1.33 is right at the boundary; what matters is
        # the pool size (6, not 3) and that ANOTHER degraded-epoch
        # capture eventually reads normal as the old epoch ages out
        assert w["n_reference_captures"] == 3 + WEATHER_REBASELINE_AFTER
        # one round later the old epoch is mostly gone
        for i in range(WEATHER_REBASELINE_AFTER):
            d = {"queries": self.Q, "outliers_dropped": ["c"],
                 "duckdb_total_ex_outlier": 14.0, "sf": 0.1,
                 "capture_weather": {"verdict": "DEGRADED_BOX"}}
            (tmp_path / f"BENCH_r{20 + i:02d}.json").write_text(
                json.dumps(d), encoding="utf-8")
        w2 = capture_weather(14.0, {"a", "b"}, 0.1, root=tmp_path)
        assert w2["trailing_median_s"] == 14.0
        assert w2["capture_degraded"] is False

    def test_brief_degradation_still_excluded(self, tmp_path):
        # fewer than WEATHER_REBASELINE_AFTER trailing degraded
        # captures -> the r13 exclusion still applies (weather, not
        # a new epoch)
        from bench import WEATHER_REBASELINE_AFTER
        assert WEATHER_REBASELINE_AFTER >= 2
        for i, v in enumerate([7.0, 7.1, 6.9]):
            _ref(tmp_path / f"BENCH_r{i:02d}.json", self.Q, ["c"], v)
        for i in range(WEATHER_REBASELINE_AFTER - 1):
            d = {"queries": self.Q, "outliers_dropped": ["c"],
                 "duckdb_total_ex_outlier": 14.0, "sf": 0.1,
                 "capture_weather": {"verdict": "DEGRADED_BOX"}}
            (tmp_path / f"BENCH_r{10 + i:02d}.json").write_text(
                json.dumps(d), encoding="utf-8")
        w = capture_weather(14.0, {"a", "b"}, 0.1, root=tmp_path)
        assert w["n_reference_captures"] == 3  # degraded still out
        assert w["capture_degraded"] is True

    def test_reference_set_bounded_to_newest(self, tmp_path):
        # r13 ADVICE: the median is over the WEATHER_MAX_REFS newest
        # captures, so a permanent environment change re-baselines
        # instead of skewing the signal forever
        from bench import WEATHER_MAX_REFS
        # old epoch: fast box
        for i in range(WEATHER_MAX_REFS):
            _ref(tmp_path / f"BENCH_r{i:02d}.json", self.Q, ["c"], 7.0)
        # new epoch: the box got permanently 2x slower
        for i in range(WEATHER_MAX_REFS):
            _ref(tmp_path / f"BENCH_r{20 + i:02d}.json", self.Q,
                 ["c"], 14.0)
        w = capture_weather(14.0, {"a", "b"}, 0.1, root=tmp_path)
        assert w["n_reference_captures"] == WEATHER_MAX_REFS
        assert w["trailing_median_s"] == 14.0  # old epoch aged out
        assert w["capture_degraded"] is False

    def test_round_parse_ignores_ancestor_dirs(self, tmp_path):
        # review r14: the recency sort must parse rounds from the
        # root-RELATIVE path — an 'r<digit>' in an ancestor dir
        # (e.g. /home/user2/) would otherwise poison every ref
        from bench import WEATHER_MAX_REFS
        root = tmp_path / "checkout-r2" / "repo"
        root.mkdir(parents=True)
        # an old fast epoch that must age out of the bounded set
        _ref(root / "BENCH_r01.json", self.Q, ["c"], 3.0)
        for i in range(2, 2 + WEATHER_MAX_REFS):
            _ref(root / f"BENCH_r{i:02d}.json", self.Q, ["c"], 14.0)
        w = capture_weather(14.0, {"a", "b"}, 0.1, root=root)
        assert w["n_reference_captures"] == WEATHER_MAX_REFS
        assert "BENCH_r01.json" not in w["reference_captures"]
        assert w["trailing_median_s"] == 14.0

    def test_unreadable_reference_skipped(self, tmp_path):
        (tmp_path / "BENCH_r01.json").write_text("{not json",
                                                 encoding="utf-8")
        w = capture_weather(14.0, {"a", "b"}, 0.1, root=tmp_path)
        assert w["n_reference_captures"] == 0

    #: the reference set PINNED to the artifacts committed before
    #: round 13 — the retrodiction must not drift as future rounds
    #: commit more captures into the live repo (review r13: a few
    #: slow-weather rounds would raise the trailing median until the
    #: assertion flips on a commit that touched no code)
    R12_REFS = (
        "BENCH_r06.json", "BENCH_r07.json", "BENCH_r08.json",
        "BENCH_r09.json", "BENCH_r10.json", "BENCH_r11.json",
        "BENCH_r12.json",
        "docs/scale_r10/bench_capture1.json",
        "docs/scale_r10/bench_capture2.json",
        "docs/scale_r10/bench_capture3.json",
        "docs/scale_r12/bench_r12_capture1.json",
        "docs/scale_r12/bench_r12_capture2.json",
    )

    def test_real_repo_artifacts_retrodict_r12(self, tmp_path):
        """BENCH_r12 (the degraded-box driver capture) must
        self-label against the history as committed at round 13;
        the idle builder capture from the same tree must not."""
        import shutil

        root = Path(__file__).resolve().parent.parent
        (tmp_path / "docs" / "scale_r12").mkdir(parents=True)
        (tmp_path / "docs" / "scale_r10").mkdir(parents=True)
        for rel in self.R12_REFS:
            shutil.copy(root / rel, tmp_path / rel)
        d = json.loads((root / "BENCH_r12.json").read_text())["parsed"]
        ex = set(d["queries"]) - set(d["outliers_dropped"])
        w = capture_weather(d["duckdb_total_ex_outlier"], ex, 0.1,
                            root=tmp_path)
        assert w["n_reference_captures"] == len(self.R12_REFS)
        assert w.get("capture_degraded") is True
        c = json.loads((root / "docs/scale_r12/"
                        "bench_r12_capture1.json").read_text())
        ex2 = set(c["queries"]) - set(c["outliers_dropped"])
        w2 = capture_weather(c["duckdb_total_ex_outlier"], ex2, 0.1,
                             root=tmp_path)
        assert w2.get("capture_degraded") is False


class TestBaselineRegression:
    def test_rule_shapes(self):
        from bench import _baseline_regression
        assert not _baseline_regression(None, 5.0)   # no baseline
        assert not _baseline_regression(2.0, 2.4)    # within weather
        assert not _baseline_regression(0.2, 0.6)    # gap too small
        assert _baseline_regression(2.0, 3.1)        # 1.55x, 1.1s gap
        assert _baseline_regression(0.3, 1.2)        # 4x, 0.9s gap

    def test_baseline_file_covers_registry(self):
        # every committed registry entry should carry a baseline so
        # the old threshold rules only apply to genuinely new entries
        root = Path(__file__).resolve().parent.parent
        doc = json.loads((root / "docs/sweep_steady_baseline.json")
                         .read_text())
        assert len(doc["entries"]) >= 209
        for name, row in doc["entries"].items():
            assert row["steady_s"] > 0, name


class TestLegSanityRerun:
    """r15: a decomposition LEG reading above the composed headline
    wall is a contradiction (the leg is a subset of the composed
    work) — the measurement must re-run instead of publishing it."""

    def test_rerun_until_under_sanity(self):
        from bench import _leg_best_of

        class FakeDF:
            class write:
                @staticmethod
                def format(_):
                    return FakeDF.write

                @staticmethod
                def mode(_):
                    return FakeDF.write

                @staticmethod
                def save():
                    return None

        import time as _t
        walls = iter([6.4, 6.2, 2.0, 99.0])
        t = {"now": 0.0}

        def fake_perf():
            return t["now"]

        calls = {"n": 0}

        def mk():
            calls["n"] += 1
            t["now"] += next(walls)
            return FakeDF

        import bench as B
        real = B.time.perf_counter
        B.time.perf_counter = fake_perf

        class FakeSpark:
            class catalog:
                @staticmethod
                def clearCache():
                    return None

        try:
            best = _leg_best_of(FakeSpark, mk, sanity_max_s=2.1)
        finally:
            B.time.perf_counter = real
        assert best == 2.0
        assert calls["n"] == 3  # two contaminated + one clean

    def test_no_sanity_keeps_two_runs(self):
        from bench import _leg_best_of

        class FakeDF:
            class write:
                @staticmethod
                def format(_):
                    return FakeDF.write

                @staticmethod
                def mode(_):
                    return FakeDF.write

                @staticmethod
                def save():
                    return None

        import bench as B
        walls = iter([3.0, 2.5, 99.0])
        t = {"now": 0.0}

        def fake_perf():
            return t["now"]

        calls = {"n": 0}

        def mk():
            calls["n"] += 1
            t["now"] += next(walls)
            return FakeDF

        class FakeSpark:
            class catalog:
                @staticmethod
                def clearCache():
                    return None

        real = B.time.perf_counter
        B.time.perf_counter = fake_perf
        try:
            best = _leg_best_of(FakeSpark, mk)
        finally:
            B.time.perf_counter = real
        assert best == 2.5
        assert calls["n"] == 2
