"""bench.py output-contract lint (r8 verdict item 8, shipped r10).

The external driver parses the LAST stdout line of bench.py with a
bounded tail capture; BENCH_r07 recorded parsed:null because ~70 extras
had pushed "metric"/"value" off the front of a single giant line. This
pins the contract structurally — no Spark session needed: the headline
line must be LAST, self-contained, parseable, and small enough that a
tail capture always sees it whole, even with every gate timed.
"""

from __future__ import annotations

import json

import bench

TAIL_CAPTURE_BUDGET = 4096  # conservative driver tail-capture bound


def _fake_run():
    timings = {name: 1.234 for name in bench.HEADLINE}
    extras = {name: 2.345 for name in bench.EXTRAS}
    duck = {name: (None if i % 7 == 0 else 0.5)
            for i, name in enumerate(bench.HEADLINE)}
    return bench.format_output(timings, extras, duck, bench.SF_DIR)


def test_last_line_is_compact_headline_json():
    lines = _fake_run()
    assert len(lines) == 2
    obj = json.loads(lines[-1])
    assert obj["metric"] == "total_headline_sec"
    assert obj["unit"] == "sec"
    assert isinstance(obj["value"], float)
    assert set(obj["queries"]) == set(bench.HEADLINE)
    assert "sf" in obj and "duckdb_total_sec" in obj
    # extras/duck detail must NOT ride on the parsed line
    assert "extras" not in obj and "duckdb" not in obj


def test_headline_line_fits_tail_capture():
    lines = _fake_run()
    assert len(lines[-1]) < TAIL_CAPTURE_BUDGET, (
        "headline line outgrew the driver tail capture — move detail to "
        "the first line (the BENCH_r07 regression)")


def test_detail_line_is_standalone_json():
    lines = _fake_run()
    obj = json.loads(lines[0])
    assert set(obj["extras"]) == set(bench.EXTRAS)
    assert set(obj["duckdb"]) == set(bench.HEADLINE)
