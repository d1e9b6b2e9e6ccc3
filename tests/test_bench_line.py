"""The bench stdout contract (VERDICT r12 #2).

The driver tail-captures only the last ~2000 characters of bench.py's
stdout and json-parses the final line. BENCH_r05..r12 all recorded
"parsed": null because the line embedded the full per-query map and
its HEAD (where "value" lives) scrolled out of the window. These
tests pin the compact-line builder against a full-registry-sized
timing map so the regression cannot silently return as the headline
set grows.
"""

from __future__ import annotations

import json

import bench

# The driver's capture window is ~2000 chars; leave headroom for the
# window also holding a stderr-spill or partial previous line.
LINE_BUDGET = 1200


def _fake_timings(n: int) -> dict[str, float]:
    # worst-case realistic name lengths (longest registry names are
    # ~35 chars) and 4-digit-seconds values
    return {
        f"dd{i:03d}_incremental_semdedup_linear_x": 1000.0 + i / 1000
        for i in range(n)
    }


def test_compact_line_fits_driver_window_at_full_registry_size():
    line = bench.compact_line(
        _fake_timings(500), "0.1", 1.234, 5.678, errors={}, ref_n=3
    )
    s = json.dumps(line)
    assert len(s) <= LINE_BUDGET, f"{len(s)} chars: {s[:200]}..."


def test_compact_line_fits_budget_with_max_retimed_names():
    """VERDICT r14 #1: the retime pass caps its suspect list at 10;
    even 10 worst-case-length names plus the rest of the line must fit
    the driver's capture window."""
    t = _fake_timings(500)
    retimed = sorted(t, key=t.get, reverse=True)[:10]
    line = bench.compact_line(
        t, "0.1", 1.234, 5.678, errors={}, ref_n=3, retimed=retimed
    )
    assert line["retimed"] == sorted(retimed)
    s = json.dumps(line)
    assert len(s) <= LINE_BUDGET, f"{len(s)} chars: {s[:200]}..."


def test_compact_line_omits_retimed_when_empty():
    line = bench.compact_line({}, "0.1", 1.0, 2.0, {}, retimed=[])
    assert "retimed" not in line
    legacy = bench.compact_line({}, "0.1", 1.0, 2.0, {})
    assert "retimed" not in legacy


def test_compact_line_flags_partial_ref_cohort():
    """r13 ADVICE: a cohort query that errored or lacked tables must
    be visible on the compact line, not only in stderr siblings."""
    full = bench.compact_line({}, "0.1", 1.0, 2.0, {}, ref_n=len(bench.REF_COHORT))
    assert full["ref_n"] == len(bench.REF_COHORT)
    assert "partial_ref" not in full
    part = bench.compact_line({}, "0.1", 1.0, 2.0, {}, ref_n=2)
    assert part["ref_n"] == 2 and part["partial_ref"] is True
    legacy = bench.compact_line({}, "0.1", 1.0, 2.0, {})
    assert "ref_n" not in legacy and "partial_ref" not in legacy


def test_compact_line_carries_contract_fields_and_worst5():
    t = _fake_timings(89)
    errors = {f"q{i}": "boom" for i in range(3)}
    line = bench.compact_line(t, "0.1", 1.0, 2.0, errors)
    assert line["metric"] == "headline_queries_total"
    assert line["unit"] == "sec"
    assert line["sf"] == 0.1
    assert line["n_queries"] == 89
    assert line["value"] == round(sum(t.values()), 3)
    assert len(line["queries"]) == 5
    # the 5 worst by median, descending membership
    assert set(line["queries"]) == set(
        sorted(t, key=t.get, reverse=True)[:5]
    )
    assert line["error_count"] == 3 and line["partial"] is True
    assert line["ref_secs"] == 2.0
    # json round-trip (what the driver does)
    assert json.loads(json.dumps(line)) == line


def test_compact_line_handles_empty_sweep():
    line = bench.compact_line({}, "custom", 1.0, 0.0, {})
    assert line["value"] == 0 and line["n_queries"] == 0
    assert line["sf"] == "custom"


def test_retime_suspects_catches_the_r14_trio_class():
    """The r14 driver window slowed s18/s19/t23 on EVERY run (no
    within-query dispersion), but the ref cohort's start/middle/end
    samples saw the machine move — the worst-5 must then be queued
    for a fresh timing block."""
    timings = {
        "s18_mutual_knn_linear": 12.1,
        "s19_margin_alignment_linear": 9.3,
        "t23_source_unigram_tvd": 6.1,
        "dd16_pagerank_dup_graph": 7.0,
        "dd6_dup_clusters": 5.9,
        "t1_token_stats": 0.5,
    }
    spread = {n: [v * 0.95, v * 1.05, 3] for n, v in timings.items()}
    # cohort middle sample landed inside the slow window
    refs = {"t1": [0.5, 1.6, 0.52], "dd3": [1.8, 1.9, 1.85]}
    got = bench.retime_suspects(timings, spread, refs)
    assert set(got) == {
        "s18_mutual_knn_linear", "s19_margin_alignment_linear",
        "t23_source_unigram_tvd", "dd16_pagerank_dup_graph",
        "dd6_dup_clusters",
    }


def test_retime_suspects_dispersion_always_fires_and_clean_run_is_free():
    timings = {"q_slow": 5.0, "q_ok": 3.0, "t1": 0.4}
    spread = {"q_slow": [1.2, 5.4, 3], "q_ok": [2.9, 3.1, 3],
              "t1": [0.38, 0.42, 7]}
    refs = {"t1": [0.5, 0.52, 0.51]}
    got = bench.retime_suspects(timings, spread, refs)
    # dispersion suspect first, then the machine-moved worst-5 fill
    assert got[0] == "q_slow" and "q_ok" in got and "t1" not in got
    # clean run: flat cohort, no dispersion -> zero retime cost
    clean_spread = {"q_slow": [4.8, 5.2, 3], "q_ok": [2.9, 3.1, 3],
                    "t1": [0.38, 0.42, 7]}
    assert bench.retime_suspects(timings, clean_spread, refs) == []


def test_retime_suspects_caps_at_ten():
    timings = {f"q{i:02d}": 10.0 + i for i in range(20)}
    spread = {n: [1.0, v, 3] for n, v in timings.items()}
    got = bench.retime_suspects(timings, spread, {})
    assert len(got) == 10
    # worst-first ordering
    assert got[0] == "q19"
